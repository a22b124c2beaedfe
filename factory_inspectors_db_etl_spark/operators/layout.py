"""Data-layout operators: Z-order (Morton) clustering keys for
multi-dimensional min/max pruning.

Why this exists at 100 TB: partition pruning + parquet row-group min/max
stats only help on the SORT column.  A fact table queried by BOTH time
and key (the reference's Assignments table carries exactly such a pair —
its B-tree indexes on Year and InspectorID, ``populate_db_ru_v1.py:
175-179``, serve two independent access paths) cannot be sorted by both.
Interleaving the bits of the two dimensions into one Morton key and
range-partition-sorting by it bounds EVERY file's span in EVERY
dimension at once (the classic space-filling-curve layout, Morton 1966;
the same technique behind Delta/Iceberg Z-ORDER clustering).

Everything is integer/bit arithmetic on columns — no UDFs, reproducible
verbatim in the SQL oracle, scan-speed at any scale.  The min/max
normalization constants are computed by one tiny aggregate and broadcast
back in-plan (no driver collect).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interleave_bits", "zorder_key", "zorder_layout"]


def interleave_bits(cols: list[Column], bits_per_dim: int = 8) -> Column:
    """Morton-interleave ``bits_per_dim`` low bits of each (non-negative
    integer) column: bit ``i`` of dimension ``d`` lands at position
    ``i * ndims + d``.  Pure shift/mask arithmetic — identical in any
    engine with integer division (the oracle uses div/mod, which Spark's
    ``shiftright``/``%`` match exactly for non-negative inputs)."""
    ndims = len(cols)
    out = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits_per_dim):
            bit = F.shiftright(c, i) % 2
            out = out + F.shiftleft(bit, i * ndims + d)
    return out


def zorder_key(
    df: DataFrame, cols: list[str], bits_per_dim: int = 8, out_col: str = "zkey"
) -> DataFrame:
    """Add a Morton key over ``cols``: each dimension is min/max-scaled
    to ``[0, 2^bits_per_dim)`` (rank-preserving integer bucketing), then
    bit-interleaved.

    The per-column min/max come from ONE partial-aggregated scan whose
    1-row result is broadcast back — the main scan is never shuffled.
    Constant dimensions (min == max) map to bucket 0.  NULL dimension
    values land in the TOP bucket (both Spark's and DuckDB's ``least``
    skip NULL operands), identically in engine and oracle — filter or
    impute first if that placement is wrong for the workload.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
        ]
    stats = df.agg(*aggs)
    top = (1 << bits_per_dim) - 1
    joined = df.crossJoin(F.broadcast(stats))
    buckets = []
    for c in cols:
        lo, hi = F.col(f"_min_{c}"), F.col(f"_max_{c}")
        span = hi - lo
        scaled = F.when(span > 0, F.floor(
            (F.col(c).cast("double") - lo) / span * (top + 1)
        )).otherwise(F.lit(0))
        buckets.append(F.least(scaled, F.lit(top)).cast("long"))
    return joined.withColumn(out_col, interleave_bits(buckets, bits_per_dim)).drop(
        *[f"_{m}_{c}" for c in cols for m in ("min", "max")]
    )


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits_per_dim: int = 8,
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition by the Morton key into
    ``n_files`` tasks and sort within each — every output file then
    covers a bounded hyper-rectangle of the key space, so min/max file
    stats prune on EVERY ``cols`` dimension.  One range shuffle
    (sampled boundaries), the standard pre-write clustering pass."""
    keyed = zorder_key(df, cols, bits_per_dim)
    return keyed.repartitionByRange(n_files, "zkey").sortWithinPartitions("zkey")
