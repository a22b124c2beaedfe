"""FIFO allocation: match an ordered demand stream against an ordered
supply stream per key, emitting the exact quantity each (demand, supply)
pair exchanges — the inventory/cost-allocation (FIFO lot matching)
operator behind billing, fulfilment, and tax-lot engines.

The classical statement is sequential (walk both queues, peel
quantities), which looks driver-side.  The distributed form used here
rests on the cumulative-interval identity: give demand row i the
half-open integer interval ``[D_{i-1}, D_i)`` of cumulative demanded
units and supply row j ``[S_{j-1}, S_j)`` of cumulative supplied units;
FIFO matches exactly the unit ranges that overlap, so

    alloc(i, j) = max(0, min(D_i, S_j) - max(D_{i-1}, S_{j-1}))

and the whole allocation is a per-key interval-overlap self-join — no
sequential walk, no recursion, no Python.  Pairing follows the J11
interval-overlap discipline (``plans/catalog_ext.py``): intervals
explode to fixed-width CELLS of the cumulative axis and pair by
``(key, cell)`` equi-join, so the join never degenerates to per-key
all-pairs — candidate volume is O(intervals x span/width + matches).

Scale posture (100 TB): one shuffle on the key serves both cumulative
windows (demand and supply ride the same partitioning); the cell
explode is shuffle-free; the pair join is an equi-join AQE can plan.
Every quantity is an exact integer (BIGINT), so the result is
bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fifo_allocate(
    demand: DataFrame,
    supply: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    qty_col: str,
    cell_width: int = 64,
) -> DataFrame:
    """FIFO-match ``demand`` rows to ``supply`` rows per ``key_cols``.

    Both inputs need integer-valued ``qty_col`` (> 0 rows participate;
    zero-quantity rows are dropped — they occupy no unit range) and a
    TOTAL per-key order under ``order_cols`` (catalog rule: totality is
    the caller's contract — duplicate order keys make the cumsum
    nondeterministic).

    Returns one row per overlapping (demand, supply) pair: the key
    columns, demand order columns prefixed ``d_``, supply order columns
    prefixed ``s_``, and ``alloc_qty`` (BIGINT, always >= 1).  The sum
    of ``alloc_qty`` over a key equals min(total demand, total supply)
    — the conservation law pinned in tests.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    cum = F.sum(qty_col).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

    def prep(df: DataFrame, prefix: str) -> DataFrame:
        sides = (
            df.filter(F.col(qty_col) > 0)
            .withColumn("_hi", cum.cast("long"))
            .withColumn("_lo", (F.col("_hi") - F.col(qty_col)).cast("long"))
        )
        # cells the unit interval [lo, hi) touches on the cumulative axis
        cells = sides.withColumn(
            "_cell",
            F.explode(
                F.sequence(
                    F.expr(f"_lo div {cell_width}"), F.expr(f"(_hi - 1) div {cell_width}")
                )
            ),
        )
        keep = (
            [F.col(k) for k in key_cols]
            + [F.col(c).alias(f"{prefix}{c}") for c in order_cols]
            + [
                F.col("_lo").alias(f"{prefix}lo"),
                F.col("_hi").alias(f"{prefix}hi"),
                F.col("_cell"),
            ]
        )
        return cells.select(*keep)

    d = prep(demand, "d_")
    s = prep(supply, "s_")
    pairs = (
        d.join(s, [*key_cols, "_cell"])
        .filter((F.col("d_lo") < F.col("s_hi")) & (F.col("s_lo") < F.col("d_hi")))
        # canonical-cell discipline (J21's rule — each pair meets on
        # exactly ONE key): a pair spanning a cell boundary co-occurs in
        # every shared cell, but its overlap START max(d_lo, s_lo) lies
        # in exactly one — keep the pair only there.  This replaces the
        # former `.distinct()`, which re-shuffled the operator's largest
        # intermediate (the full pair output) just to drop the echoes.
        .filter(
            F.col("_cell") == F.expr(f"greatest(d_lo, s_lo) div {cell_width}")
        )
        .select(
            *key_cols,
            *[f"d_{c}" for c in order_cols],
            *[f"s_{c}" for c in order_cols],
            (
                F.least("d_hi", "s_hi") - F.greatest("d_lo", "s_lo")
            ).cast("long").alias("alloc_qty"),
        )
    )
    return pairs
