"""As-of (last-match lookback) operators (SURVEY.md §2.4 J6, §2.6 W5).

``asof_fill`` re-expresses the reference's senior-inspector back-reference
(populate_db_ru_v1.py:724-744: "latest previously inserted row with role X
for the same group", implemented there as a read-back SQL query against
rows just written) as a pure window over the in-flight DataFrame — the
write-read cycle disappears.

``asof_join`` is the general two-table as-of join (extension; J8): for each
left row, the latest right row with ``right.on <= left.on`` per key.  It is
implemented as union + window fill rather than a range join, which keeps it
a single shuffle on the key and avoids the O(n*m) theta-join blowup; this is
the scalable pattern for 100 TB (state per key bounded by one carried row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_fill(
    df: DataFrame,
    condition: Column,
    payload: Sequence[str],
    partition_by: Sequence[str],
    order_by: Sequence[str],
    out_prefix: str = "asof_",
    include_current: bool = True,
) -> DataFrame:
    """For each row, carry the payload of the latest row (up to and
    optionally including the current one) where ``condition`` held.
    """
    end = Window.currentRow if include_current else -1
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    marker = F.when(condition, F.struct(*[F.col(c) for c in payload]))
    carried = F.last(marker, ignorenulls=True).over(w)
    out = df.withColumn("_asof", carried)
    for c in payload:
        out = out.withColumn(f"{out_prefix}{c}", F.col(f"_asof.{c}"))
    return out.drop("_asof")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    on: str,
    payload: Sequence[str],
    tolerance: Column | None = None,
) -> DataFrame:
    """Point-in-time join: latest ``right`` row with ``right.on <= left.on``
    for each key group, carried onto the left row.

    Union-based single-shuffle implementation: tag sides, sort within key by
    (on, side) and forward-fill the right payload onto left rows.  Ties on
    ``on`` resolve right-before-left (right side sorts first), matching the
    usual "as of <= t" semantics.
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(*keys, on, *payload).withColumn("_side", F.lit(0))
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marker = F.when(
        F.col("_side") == 0, F.struct(*[F.col(c) for c in payload], F.col(on).alias("_r_on"))
    )
    carried = F.last(marker, ignorenulls=True).over(w)
    out = unioned.withColumn("_asof", carried).filter(F.col("_side") == 1)
    for c in payload:
        out = out.withColumn(c, F.col(f"_asof.{c}"))
    if tolerance is not None:
        for c in payload:
            out = out.withColumn(
                c,
                F.when(F.col(on) - F.col("_asof._r_on") <= tolerance, F.col(c)),
            )
    return out.select(*lcols, *payload)
