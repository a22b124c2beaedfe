"""Dense time-grid gap filling with exact linear interpolation.

The hypertable-style resample→gap-fill→interpolate pipeline (the shape
TimescaleDB calls ``time_bucket_gapfill`` + ``interpolate``): bucket an
event stream to a fixed grid, densify each key's grid between its first
and last observed bucket, and fill the holes — linear interpolation
between the surrounding observations, forward/backward fill past the
edges.

Scale shape: one hash aggregation buckets the stream; ONE lead-pass
window over the observed buckets pairs each observation with its
successor, and the dense grid is generated from each pair WITHOUT a
generator UDF (``sequence`` + ``explode``) with the interpolated value
computed inline — the grid itself is never sorted, joined, or
windowed.  Nothing is ever collected; grid size is sum-of-spans,
linear in keys × horizon.

Cross-engine determinism (the catalog convention): bucket values are
summed in integer cents; interpolation happens as ONE integer
cross-multiplication — ``v_prev*(next-i) + v_next*(i-prev)`` over hour
indexes — followed by a single correctly-rounded double division by
``(next-prev)*100``.  Dollar-rounding or repeated float math would be a
per-engine ulp knife-edge (see w12's lesson in plans/catalog.py).

Buckets are emitted as ISO strings and hour INDEXES (position in the
per-key grid), never unix epochs: ``date_trunc``/``timestampadd`` are
pure calendar arithmetic on TIMESTAMP_NTZ, identical in any session
timezone — ``unix_timestamp`` is not (hostile-session lesson,
scripts/driver_sim.py --hostile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def gap_fill_hourly(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Hourly resample + gap fill of ``value_col`` (a dollar amount)
    per ``key_col``.

    Per key: sum cents per hour bucket, densify [first, last] observed
    hour, then per missing hour emit linearly-interpolated value
    (``fill_kind='interp'``); observed hours are ``'exact'``.  Edge
    buckets of the [min, max] span are observed by construction, so
    every hole has both interpolation endpoints.

    Returns (key, bucket ISO-string, value_filled double, fill_kind).
    """
    key, ts = F.col(key_col), F.col(ts_col)
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    hourly = df.groupBy(
        key.alias("_key"), F.date_trunc("HOUR", ts).alias("_hts")
    ).agg(F.sum(cents).alias("_v"))
    # One window pass over the OBSERVED buckets only (the dense grid is
    # never sorted or windowed): each observed row learns its successor,
    # then generates itself plus every missing hour up to (exclusive)
    # that successor, with the interpolated value computed inline from
    # the pair.  Integer arithmetic is unchanged from the two-pass
    # formulation — v_prev*(gap-i) + v_next*i over the same hour
    # indexes, one division by gap*100 — so the output is bit-identical;
    # what changed is the cost: the original filled the grid with
    # last/first ``ignorenulls`` passes whose [current, unbounded
    # following] frame Spark evaluates by rescanning the remainder of
    # the partition per row (quadratic per key; measured 14 s of an
    # 18 s sf0.1 runtime), while this shape is one O(n log n) sort of
    # the observed rows and a generator projection.
    w = W.partitionBy("_key").orderBy("_hts")
    paired = hourly.select(
        "_key",
        "_hts",
        "_v",
        F.lead("_v").over(w).alias("_nv"),
        F.expr("timestampdiff(HOUR, _hts, lead(_hts) OVER "
               "(PARTITION BY _key ORDER BY _hts))").alias("_gap"),
    )
    steps = F.explode(
        F.sequence(F.lit(0), F.coalesce(F.col("_gap") - 1, F.lit(0)))
    )
    dense = paired.select("_key", "_hts", "_v", "_nv", "_gap", steps.alias("_i"))
    interp_num = (
        F.col("_v") * (F.col("_gap") - F.col("_i")) + F.col("_nv") * F.col("_i")
    ).cast("double")
    value_filled = F.when(
        F.col("_i") == 0, F.col("_v").cast("double") / 100
    ).otherwise(interp_num / (F.col("_gap") * 100))
    fill_kind = F.when(F.col("_i") == 0, F.lit("exact")).otherwise(F.lit("interp"))
    return dense.select(
        F.col("_key").alias(key_col),
        F.date_format(F.expr("timestampadd(HOUR, _i, _hts)"), "yyyy-MM-dd HH:00:00").alias(
            "bucket"
        ),
        value_filled.alias("value_filled"),
        fill_kind.alias("fill_kind"),
    )
