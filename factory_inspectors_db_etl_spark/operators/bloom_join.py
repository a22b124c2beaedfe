"""Explicit Bloom-filter runtime pre-filtering for selective joins.

The 100 TB problem this solves: a fact table joins a dim side that is
too big to broadcast as exact keys (hundreds of millions of surviving
keys after a selective filter), so the join must shuffle BOTH sides —
including the >99% of fact rows that will never match.  A Bloom filter
over the build-side keys is CONSTANT-size regardless of key count
(``num_bits/8`` bytes), always broadcastable, and lets every fact task
drop non-matching rows BEFORE the shuffle.  False positives are then
removed by the exact join, so the composed operator is semantically
invisible — the result equals the plain join, which is exactly what the
DuckDB oracle checks.

This is the hand-rolled, plan-pinnable version of Spark's own runtime
row-level filtering (``spark.sql.optimizer.runtime.bloomFilter.*``),
kept explicit so the bit array, hash family, and probe predicate are
all testable and engine-portable:

- build: k positions per key via ``xxhash64(key, seed_i) mod m``; the
  bit array is ``m/64`` longs aggregated with ``bit_or`` (two tiny
  shuffles: positions→words, words→one row).  Pure JVM expressions —
  no driver collect, no UDF (``df.stat.bloomFilter`` collects to the
  driver; this never does).
- probe: the one-row bitmap broadcasts onto the fact side
  (BroadcastNestedLoopJoin over exactly one row), and membership is an
  AND over k bit tests — whole-stage-codegen'd, evaluated at the scan,
  under the join exchange.

No false negatives, ever: every true key sets exactly the bits its own
probe reads (same hash family both sides) — pinned property-style in
``tests/test_round5b_ops.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEED_BASE = 0xB100F


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(_SEED_BASE + i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 18,
    num_hashes: int = 5,
) -> DataFrame:
    """ONE-row DataFrame ``(bloom_words array<bigint>)`` — the Bloom
    filter over ``keys[key_col]``, ``num_bits`` bits as ``num_bits/64``
    longs.  Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; the
    default 2^18 bits (32 KiB) holds ~25k keys at <5% FP, and the array
    stays broadcast-trivial at any ``num_bits`` a real cluster would
    use (2^30 bits = 128 MiB)."""
    assert num_bits % 64 == 0
    n_words = num_bits // 64
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), num_bits, num_hashes))).alias(
            "_pos"
        )
    )
    words = pos.select(
        (F.col("_pos") / 64).cast("int").alias("_w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias("_m"),
    ).groupBy("_w").agg(F.bit_or("_m").alias("_bits"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("_w", "_bits"))).alias("_wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda w: F.coalesce(F.element_at("_wm", w.cast("int")), F.lit(0).cast("long")),
        ).alias("bloom_words")
    )


def bloom_prefilter(
    fact: DataFrame,
    fact_key: str,
    bloom: DataFrame,
    num_bits: int,
    num_hashes: int = 5,
) -> DataFrame:
    """Fact rows surviving the Bloom probe (superset of true matches).

    The one-row bitmap broadcasts; the probe is k codegen'd bit tests
    per row at the scan.  Positions are bound as named columns first so
    the bit-test expressions (SQL ``shiftright`` takes column shift
    amounts, the pyspark wrapper does not) reference stable names.
    Scratch names (the bitmap column and the k position columns) are
    suffixed until they collide with nothing in ``fact`` — a fact table
    that already has a ``bloom_words`` or ``_bpos0`` column keeps it
    intact.  Output drops only the scratch columns."""
    # deterministic collision-proof scratch names (no uuid: plans must
    # be reproducible run-to-run for plan pins and driver resume)
    suffix = ""
    existing = set(fact.columns)
    while {"bloom_words" + suffix, *(f"_bpos{i}{suffix}" for i in range(num_hashes))} & existing:
        suffix += "_x"
    bw = "bloom_words" + suffix
    probed = fact.crossJoin(F.broadcast(bloom.withColumnRenamed("bloom_words", bw)))
    scratch = []
    for i, p in enumerate(_positions(F.col(fact_key), num_bits, num_hashes)):
        probed = probed.withColumn(f"_bpos{i}{suffix}", p)
        scratch.append(f"_bpos{i}{suffix}")
    keep = F.lit(True)
    for c in scratch:
        keep = keep & F.expr(
            f"(shiftright(element_at({bw}, CAST({c} DIV 64 AS INT) + 1), "
            f"CAST({c} % 64 AS INT)) & 1) = 1"
        )
    return probed.filter(keep).drop(bw, *scratch)


def bloom_filtered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 18,
    num_hashes: int = 5,
) -> DataFrame:
    """``fact ⋈ dim`` with a Bloom pre-filter on the fact side: build
    the filter over ``dim[dim_key]``, drop fact rows that cannot match
    BEFORE the join's exchange, then run the exact equi-join (which
    eliminates Bloom false positives).  Result == plain inner join."""
    bloom = build_bloom(dim.select(dim_key).distinct(), dim_key, num_bits, num_hashes)
    lean = bloom_prefilter(fact, fact_key, bloom, num_bits, num_hashes)
    return lean.join(dim, F.col(fact_key) == F.col(dim_key))
