"""Multimodal column pattern (extension M6).

Media (image/audio/video) ride through the engine as opaque ``binary``
payload columns plus a typed metadata struct — the storage pattern used by
large-scale training-data pipelines: the *plumbing* (schema, partitioning,
Arrow batch shape, UDF signatures) is fully real and tested, while the
codec step is stubbed because no image/audio libraries exist in this
container.

* ``with_payload`` manufactures a deterministic binary payload + metadata
  struct from the ``documents`` table (so every test table works at any
  scale factor).
* ``decode_and_featurize`` is the mapInPandas feature extractor: Arrow
  batches in, one feature row per media item out.  The real decoder is
  gated behind an import-try; without the codec libs it falls back to a
  deterministic byte-level featurizer (documented, test-pinned).
* ``sample_frames`` shows the one->many (frame sampling) UDTF shape.

Scale notes: payloads never pass through Python row-at-a-time — only
Arrow-batched mapInPandas; metadata lives in a separate struct column so
filters on it prune without touching payload bytes (parquet column
pruning drops the heavy binary column from the scan when unreferenced).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
        # double, not float: the feature values are exact int-count /
        # int-total ratios, and keeping them float64 end-to-end makes the
        # registered query bit-identical to the DuckDB oracle (a float32
        # roundtrip perturbs ~3% of values across a round-6 boundary)
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)

_MIMES = ["image/png", "audio/wav", "video/mp4"]


def with_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Attach a deterministic binary payload + typed metadata struct.

    The payload is the utf-8 encoding of the text (a stand-in for real
    media bytes); metadata fields derive from the id so they are stable
    across engines and scale factors.
    """
    did = F.col(id_col)
    return docs.select(
        did,
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.element_at(F.array(*[F.lit(m) for m in _MIMES]), (did % 3 + 1).cast("int")).alias("mime"),
            ((did % 8 + 1) * 64).cast("int").alias("width"),
            ((did % 4 + 1) * 64).cast("int").alias("height"),
            (did % 7 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _decode_real(payload: bytes, mime: str):  # pragma: no cover - no codecs here
    """Real decode path — requires codec libraries absent from this
    container.  Kept as the documented integration point."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media codecs (Pillow/torchaudio/pyav) are not installed; "
            "decode_and_featurize falls back to the byte-level featurizer"
        ) from e
    raise NotImplementedError("wire the codec here when the libraries exist")


def _byte_features(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic stand-in features: bucketed byte histogram, L1-normed."""
    if not payload:
        return [0.0] * n_features
    counts = [0] * n_features
    for b in payload:
        counts[b % n_features] += 1
    total = float(len(payload))
    return [c / total for c in counts]


def decode_and_featurize(media: DataFrame, n_features: int = 8) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload, meta) batches.

    Tries the real decoder once per batch; on NotImplementedError (no
    codecs) every row gets the deterministic byte-level features, so the
    pipeline shape is testable end-to-end today and upgrades in place.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                data = bytes(payload) if payload is not None else b""
                try:
                    feats = _decode_real(data, meta["mime"] if meta is not None else "")
                except NotImplementedError:
                    feats = _byte_features(data, n_features)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(data),
                        "payload_md5": hashlib.md5(data).hexdigest(),
                        "mean_byte": (sum(data) / len(data)) if data else 0.0,
                        "features": feats,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, stride: int = 1) -> DataFrame:
    """One->many frame sampling (the video path): emits ``n_frames``/stride
    rows per item, each with a deterministic per-frame digest.  Frame i's
    stand-in bytes are the i-th of n_frames equal contiguous payload
    slices (``data[i*L//n : (i+1)*L//n]``) — contiguous rather than
    strided so the DuckDB oracle can reproduce each digest with plain
    ``md5(substring(...))``."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                data = bytes(payload) if payload is not None else b""
                n = int(meta["n_frames"]) if meta is not None else 0
                length = len(data)
                for i in range(0, n, stride):
                    chunk = data[i * length // n : (i + 1) * length // n] if n else b""
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "frame_md5": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(sample, FRAME_SCHEMA)


def payload_metadata(media: DataFrame) -> DataFrame:
    """Columnar (no-UDF) metadata projection over multimodal rows: byte
    length + md5 of the payload and the flattened metadata struct.  The
    payload column itself is dropped — downstream scans of this output
    never deserialize media bytes."""
    return media.select(
        "doc_id",
        F.octet_length(F.col("payload")).alias("n_bytes"),
        F.md5(F.col("payload")).alias("payload_md5"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
    )
