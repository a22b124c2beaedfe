"""Round-7 catalog: REAL baseline-JPEG decode verified against a SQL
oracle.

Same contract as ``plans.catalog``: every query has a DuckDB oracle
registered in ``catalog.ORACLES`` and the pair sits inside the driver's
50-key window for round 7.  Determinism follows the catalog
conventions: exact integer sums with one trailing IEEE division per
float output, integer aggregates CAST to BIGINT in oracles.

Reference parity: the reference repo (populate_db_ru_v1.py) has no
media path — this module extends the engine's LLM-data-pipeline
surface (multimodal columns, SURVEY.md §2 M6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as MM
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# M-JPEG: real baseline-JPEG encode -> decode round-trip, SQL-replayed
# ---------------------------------------------------------------------------


def q_m_jpeg_decode(spark: SparkSession, sf: str) -> DataFrame:
    """M-JPEG: REAL baseline JPEG decode.  ``with_jpeg_payload`` builds a
    genuine JFIF payload per document (Annex-K Huffman tables, forward
    DCT, byte stuffing, restart markers, grayscale and YCbCr 4:4:4
    alternating by doc_id) whose PIXELS replay a SQL rule over the
    document text via constant 8x8 blocks; ``decode_and_featurize`` then
    really decodes it (``operators.jpeg.decode_jpeg``: marker walk +
    Huffman + dequant + IDCT + color convert).  Constant blocks with
    all-ones quant tables round-trip BIT-EXACTLY through the lossy
    format, so the oracle recomputes the channel means from the pixel
    RULE and a hash match proves the whole decoder end to end.  Plan:
    two Python islands (generator + decoder), both Arrow-batched
    mapInPandas; payload bytes never shuffle outside Arrow."""
    d = load_table(spark, sf, "documents")
    feats = MM.decode_and_featurize(MM.with_jpeg_payload(d))
    fx = lambda i: F.element_at("features", i)  # noqa: E731
    return feats.select(
        "doc_id",
        fx(1).cast("int").alias("width"),
        fx(2).cast("int").alias("height"),
        fx(3).cast("int").alias("n_components"),
        fx(4).alias("mean_gray"),
        fx(7).alias("mean_all"),
    )


# Spark divides (64*sum_g) / (64*nb*255); the oracle divides sum_g /
# (nb*255).  Both numerator and denominator differ by the exact
# power-of-two factor 64, so the IEEE results are bit-identical.
O_M_JPEG = """
WITH m AS (
  SELECT doc_id,
         CAST(doc_id % 4 + 2 AS BIGINT) AS wb,
         CAST(doc_id % 3 + 2 AS BIGINT) AS hb,
         length(text) AS L,
         list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1)) % 256) AS codes
  FROM documents
), s AS (
  SELECT doc_id, wb, hb,
         list_sum(list_transform(range(0, wb * hb), b ->
            CASE WHEN L = 0 THEN 0 ELSE codes[(b % L) + 1] END)) AS sum_g
  FROM m
)
SELECT doc_id,
       CAST(wb * 8 AS INTEGER) AS width,
       CAST(hb * 8 AS INTEGER) AS height,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INTEGER) AS n_components,
       CAST(sum_g AS DOUBLE) / (wb * hb * 255) AS mean_gray,
       CAST(sum_g AS DOUBLE) / (wb * hb * 255) AS mean_all
FROM s
"""


EXT5_QUERIES = {
    "m_jpeg_decode": q_m_jpeg_decode,
}

EXT5_ORACLES = {
    "m_jpeg_decode": O_M_JPEG,
}
