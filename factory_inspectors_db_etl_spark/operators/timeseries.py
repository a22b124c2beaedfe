"""Dense time-grid gap filling with exact linear interpolation.

The hypertable-style resample→gap-fill→interpolate pipeline (the shape
TimescaleDB calls ``time_bucket_gapfill`` + ``interpolate``): bucket an
event stream to a fixed grid, densify each key's grid between its first
and last observed bucket, and fill the holes — linear interpolation
between the surrounding observations, forward/backward fill past the
edges.

Scale shape: one hash aggregation buckets the stream; the per-key grid
is generated WITHOUT a generator UDF (``sequence`` + ``explode`` over
the per-key hour span); prev/next observations come from two
``ignorenulls`` window passes sharing ONE shuffle on the key (same spec,
opposite frames).  Nothing is ever collected; grid size is
sum-of-spans, linear in keys × horizon.

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
    (``fill_kind='interp'``); observed hours are ``'exact'``.  The
    ``'ffill'``/``'bfill'`` arms cover grids widened beyond the observed
    span (future ``extend`` option); on a [min, max] span the edge
    buckets are observed by construction.

    Returns (key, bucket ISO-string, value_filled double, fill_kind).
    """
    key, ts = F.col(key_col), F.col(ts_col)
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    hourly = df.groupBy(
        key.alias("_key"), F.date_trunc("HOUR", ts).alias("_hts")
    ).agg(F.sum(cents).alias("_v"))
    span = hourly.groupBy("_key").agg(
        F.min("_hts").alias("_lo"),
        F.expr("timestampdiff(HOUR, min(_hts), max(_hts))").alias("_n"),
    )
    grid = span.select(
        "_key",
        "_lo",
        F.explode(F.sequence(F.lit(0), F.col("_n"))).alias("idx"),
    ).select(
        "_key", "idx", F.expr("timestampadd(HOUR, idx, _lo)").alias("_hts")
    )
    j = grid.join(hourly, ["_key", "_hts"], "left")
    back = W.partitionBy("_key").orderBy("idx").rowsBetween(W.unboundedPreceding, 0)
    fwd = W.partitionBy("_key").orderBy("idx").rowsBetween(0, W.unboundedFollowing)
    known_idx = F.when(F.col("_v").isNotNull(), F.col("idx"))
    filled = (
        j.withColumn("_pv", F.last("_v", ignorenulls=True).over(back))
        .withColumn("_pi", F.last(known_idx, ignorenulls=True).over(back))
        .withColumn("_nv", F.first("_v", ignorenulls=True).over(fwd))
        .withColumn("_ni", F.first(known_idx, ignorenulls=True).over(fwd))
    )
    interp_num = (
        F.col("_pv") * (F.col("_ni") - F.col("idx"))
        + F.col("_nv") * (F.col("idx") - F.col("_pi"))
    ).cast("double")
    interp_den = (F.col("_ni") - F.col("_pi")) * 100
    value_filled = (
        F.when(F.col("_v").isNotNull(), F.col("_v").cast("double") / 100)
        .when(
            F.col("_pv").isNotNull() & F.col("_nv").isNotNull(),
            interp_num / interp_den,
        )
        .when(F.col("_pv").isNotNull(), F.col("_pv").cast("double") / 100)
        .otherwise(F.col("_nv").cast("double") / 100)
    )
    fill_kind = (
        F.when(F.col("_v").isNotNull(), F.lit("exact"))
        .when(F.col("_pv").isNotNull() & F.col("_nv").isNotNull(), F.lit("interp"))
        .when(F.col("_pv").isNotNull(), F.lit("ffill"))
        .otherwise(F.lit("bfill"))
    )
    return filled.select(
        F.col("_key").alias(key_col),
        F.date_format("_hts", "yyyy-MM-dd HH:00:00").alias("bucket"),
        value_filled.alias("value_filled"),
        fill_kind.alias("fill_kind"),
    )
