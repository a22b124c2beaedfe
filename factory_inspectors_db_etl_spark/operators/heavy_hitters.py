"""Exact distributed heavy hitters via Misra-Gries candidate generation.

The frequent-items problem a 100 TB corpus profiler actually has: find
every token/key whose frequency exceeds ``n/k`` WITHOUT shuffling the
full distinct-key space.  A plain ``groupBy(key).count()`` is exact but
its map-side state is one counter per distinct key per task — unbounded
for open vocabularies (URLs, n-grams, user agents).  The classic fix
(Misra & Gries 1982; mergeable form: Agarwal et al., "Mergeable
Summaries", PODS 2012) bounds per-task state at ``k`` counters and still
guarantees every true heavy hitter survives as a candidate:

  stage 1 (mapInPandas, one pass, O(k) state per task — at most 2k
      counters between amortized shrinks): each partition summarizes its
      rows into <= k Misra-Gries counters.  Guarantee:
      any x with freq_p(x) > n_p/k in partition p keeps a positive
      counter, because MG's decrement steps remove at most n_p/k from
      any single key.  Summing over partitions: any GLOBAL heavy hitter
      (freq(x) > n/k = sum_p n_p/k) must exceed n_p/k in at least one
      partition, so the union of candidate sets is a SUPERSET of the
      true heavy hitters.  Candidate count <= num_partitions * k.
  stage 2 (exact recount): broadcast-semi-join the rows against the
      tiny candidate set and count exactly — map-side partial
      aggregation now holds <= |candidates| counters per task, bounded
      by construction.  Filtering ``cnt * k > n`` (pure integers) then
      yields EXACTLY the true heavy hitters with EXACT counts: the
      candidate superset can only add rows that the filter removes.

The two-stage result is therefore deterministic and hash-checkable
against a plain ``GROUP BY ... HAVING count(*)*k > n`` oracle even
though the intermediate candidate set depends on partitioning — which is
what makes an approximate-sketch *algorithm* drivable by an *exact*
oracle (same trick as the a5/a9 bounded-error contracts, but tighter:
here the final answer is exact, not just bounded).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries -> distinct candidate keys.

    One pass over ``df``; per-task state is <= ``2k`` counters (the
    shrink triggers at 2k, amortizing the O(k)-cost decrement over k
    insertions) regardless of key cardinality.  Batches are pre-reduced
    with ``value_counts`` so the Python-side loop runs over the batch's
    DISTINCT keys; the merge follows the mergeable-summaries rule:
    add counts, and past the threshold subtract the (k+1)-th largest
    count from all and drop the non-positive ones.  Every shrink's cut
    is witnessed by >= k+1 counters, so the total decrement any single
    key can suffer is <= n_p/(k+1) < n_p/k — the superset guarantee the
    exact recount relies on survives arbitrary shrink scheduling.
    """

    df = df.select(col)  # prune: the summary reads one column; keep the
    # Arrow transfer to exactly that column regardless of input width
    out_schema = df.schema

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}

        def shrink(to: int) -> dict:
            cut = sorted(counters.values(), reverse=True)[to]
            return {x: c - cut for x, c in counters.items() if c > cut}

        for pdf in batches:
            for key, cnt in pdf[col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(cnt)
                if len(counters) > 2 * k:
                    counters = shrink(k)
        if len(counters) > k:
            counters = shrink(k)
        yield pd.DataFrame({col: list(counters.keys())})

    return df.mapInPandas(summarize, schema=out_schema).distinct()


def heavy_hitters_exact(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact heavy hitters: every ``col`` value with ``freq * k > n``,
    with its exact count and share.

    Plan: MG candidates (bounded state, see module docstring) ->
    broadcast semi join (the candidate set is <= partitions*k rows) ->
    one exact groupBy whose map-side state is bounded by the candidate
    set -> integer filter ``cnt * k > n``.  ``share`` is the single
    IEEE division at the end (bigint/bigint -> correctly-rounded double,
    bit-identical cross-engine)."""
    cands = misra_gries_candidates(df, col, k)
    n = df.agg(F.count(F.lit(1)).alias("n"))
    return (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("cnt") * k > F.col("n"))
        .select(col, "cnt", (F.col("cnt") / F.col("n")).alias("share"))
    )
