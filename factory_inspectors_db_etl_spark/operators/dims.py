"""Dimension building and FK resolution (SURVEY.md §2.4 J1-J5).

The reference resolves dimensions row-at-a-time with an in-process cache +
``SELECT``/``INSERT RETURNING`` round-trips (populate_db_ru_v1.py:181-212).
Spark-first, the whole pattern inverts into set operations:

* ``build_dim``    -- J2 get-or-create == dropDuplicates + row_number
                      surrogate keys, deterministic by natural-key order.
* ``resolve_fk``   -- J1 fact->dim natural-key lookup == broadcast hash
                      join (dims are small by construction; the reference's
                      cache dict IS the broadcast hash table).
* ``null_safe_join`` -- J3 composite keys where NULL must match NULL
                      (populate_db_ru_v1.py:229-235) == `<=>` equality.

Scale notes: dims stay broadcastable (bounded key domains); the only
shuffle is the dedup inside ``build_dim``, which is a partial-agg-friendly
``dropDuplicates`` on the natural key.  Surrogate minting is TWO-PHASE
(per-head-key ``row_number`` + broadcast cumulative offsets over the tiny
distinct-head set), so no non-tiny dim is ever funneled through a
single-partition global window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _mint_surrogate_ids(
    dedup: DataFrame, nk: Sequence[str], id_col: str, start_id: int = 1
) -> DataFrame:
    """Mint dense ids identical to ``row_number() OVER (ORDER BY nk)``
    without a global single-partition window.

    Phase 1: ``row_number`` partitioned by the FIRST natural-key column
    (parallel windows, one per head value).  Phase 2: cumulative offsets
    computed over the distinct head-key set only (bounded — one row per
    head value) and broadcast back.  Because the global sort order is
    lexicographic with the head column first, per-head rank + offset of
    all earlier heads equals the global rank exactly.  Same pattern as
    ``catalog.q_w6_global_surrogate``; null head keys are handled with a
    null-safe offset join and nulls-first ordering on both sides.
    """
    nk = list(nk)
    head = nk[0]
    order = [F.col(c).asc_nulls_first() for c in nk]
    local = dedup.withColumn(
        "_rn", F.row_number().over(Window.partitionBy(head).orderBy(*order))
    )
    counts = dedup.groupBy(head).agg(F.count(F.lit(1)).alias("_n"))
    off_w = Window.orderBy(F.col(head).asc_nulls_first()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        counts.withColumn("_off", F.coalesce(F.sum("_n").over(off_w), F.lit(0)))
        .withColumnRenamed(head, "_head")
        .select("_head", "_off")
    )
    return (
        local.join(F.broadcast(offsets), local[head].eqNullSafe(F.col("_head")))
        .withColumn(id_col, (F.col("_rn") + F.col("_off") + F.lit(start_id - 1)).cast("int"))
        .drop("_rn", "_off", "_head")
    )


def build_dim(
    df: DataFrame,
    natural_key: Sequence[str],
    id_col: str,
    extra_cols: Sequence[str] = (),
    start_id: int = 1,
) -> DataFrame:
    """Deduplicate ``natural_key`` and mint dense surrogate ids.

    Surrogate ids are ordered by the natural key so they are deterministic
    across runs/partitionings (documented divergence from the reference's
    insertion-order SERIAL ids — equivalence is on natural keys, SURVEY.md §7).
    ``extra_cols`` are carried with ``first()`` per key.
    """
    nk = list(natural_key)
    aggs = [F.first(c, ignorenulls=True).alias(c) for c in extra_cols]
    dedup = df.groupBy(*nk).agg(*aggs) if aggs else df.select(*nk).dropDuplicates(nk)
    return _mint_surrogate_ids(dedup, nk, id_col, start_id)


def build_dim_incremental(
    existing: DataFrame,
    new_rows: DataFrame,
    natural_key: Sequence[str],
    id_col: str,
) -> DataFrame:
    """Incremental get-or-create (SURVEY.md §2.4 J2, incremental variant):
    append only UNSEEN natural keys to an existing dimension, minting ids
    after the current max — existing ids never change (the property the
    reference's SERIAL column provides across runs).

    new keys = left_anti(new, existing); ids = max(existing.id) +
    row_number over the (small, deduplicated) novelty set.  The anti-join
    broadcasts the existing dim key set when small; at scale it is a
    shuffle on the natural key — still one pass over the increment only.
    """
    nk = list(natural_key)
    novel = new_rows.select(*nk).dropDuplicates(nk).join(
        existing.select(*nk), on=nk, how="left_anti"
    )
    base = existing.agg(F.coalesce(F.max(id_col), F.lit(0)).alias("m"))
    minted = (
        _mint_surrogate_ids(novel, nk, "_relid")
        .crossJoin(F.broadcast(base))
        .withColumn(id_col, (F.col("_relid") + F.col("m")).cast("int"))
        .drop("_relid", "m")
    )
    return existing.unionByName(minted.select(*existing.columns))


def resolve_fk(
    fact: DataFrame,
    dim: DataFrame,
    natural_key: Sequence[str],
    id_col: str,
    how: str = "left",
) -> DataFrame:
    """Attach ``dim``'s surrogate ``id_col`` to ``fact`` by natural key.

    Broadcast hash join — no shuffle of the fact side.
    """
    keep = fact.join(F.broadcast(dim.select(*natural_key, id_col)), on=list(natural_key), how=how)
    return keep


def null_safe_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """Join where NULL key components match NULL (SQL ``<=>`` / eqNullSafe)."""
    r = F.broadcast(right) if broadcast_right else right
    cond: Column | None = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else (cond & c)
    joined = left.join(r, on=cond, how=how)
    # drop the duplicate right-side key columns
    for k in keys:
        joined = joined.drop(right[k])
    return joined
