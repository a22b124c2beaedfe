"""SemDeDup recall, MEASURED (VERDICT r4 item #5) — the documented
cross-cluster recall trade of ``operators/similarity.py::semantic_dedup``
was asserted but never quantified.  Two regimes:

1. **Design regime** (planted near-identical vectors, threshold 0.95):
   SemDeDup's premise is that semantic near-dups have near-identical
   embeddings, so they land in the same coarse cell.  We plant exact
   perturbed copies and require ~all of them flagged.

2. **Adversarial regime** (threshold 0.40 on the raw synthetic
   embeddings, which are near-uniform — near-"dup" pairs at that
   cosine straddle cell boundaries far more than any real clustered
   corpus): recall floors pin the measured values so a regression in
   assignment/probing shows up, and multi-probe (n_probe=2) must
   strictly beat single-probe.  Precision is 1.0 by construction in
   every mode (a within-cell pair is a real pair) — also asserted.

Measured at sf0.1 (2000 vectors, 690 exact dup ids at thr=0.40):
first_n p1=0.252, p2=0.594; kmeans p1=0.354, p2=0.687; extras 0.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.operators.similarity import (
    embedding_neardup_pairs,
    semantic_dedup,
)
from factory_inspectors_db_etl_spark.sources.tables import load_table

SF01 = "/root/testdata/sf0.1"


def _dup_ids(sd_df) -> set:
    return {r[0] for r in sd_df.filter(~F.col("keep")).select("vec_id").collect()}


def test_planted_neardups_are_found_design_regime(spark, sf_dir):
    """Plant a perturbed copy of every vector (cosine ≈ 0.999 ≫ 0.95)
    under a larger id: semantic dedup at threshold 0.95 must flag ≥90%
    of the planted ids even single-probe — near-identical vectors land
    in the same cell, which is the paper's operating assumption."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    planted = e.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x * 1.02 + F.when(i == 0, F.lit(0.03)).otherwise(F.lit(0.0))
        ).alias("embedding"),
    )
    corpus = e.unionByName(planted)
    sd = semantic_dedup(corpus, n_clusters=16, threshold=0.95, n_probe=1, assign="exact")
    flagged_planted = sd.filter(
        (~F.col("keep")) & (F.col("vec_id") >= 1_000_000)
    ).count()
    assert flagged_planted >= 0.90 * n
    # and with multi-probe the boundary stragglers are caught too
    sd2 = semantic_dedup(corpus, n_clusters=16, threshold=0.95, n_probe=2, assign="exact")
    flagged2 = sd2.filter((~F.col("keep")) & (F.col("vec_id") >= 1_000_000)).count()
    assert flagged2 >= flagged_planted


@pytest.mark.slow
def test_recall_floors_adversarial_regime_sf01(spark):
    """Measured floors at sf0.1, threshold 0.40 (worst case: synthetic
    near-uniform embeddings, so 'near-dups' at cosine 0.40 are spread
    across cells).  Floors sit ~0.05 under the measured values so
    session noise can't flake them while a real assignment/probe
    regression trips them."""
    e = load_table(spark, SF01, "embeddings")
    exact = embedding_neardup_pairs(e, threshold=0.40)
    exact_dups = {
        r[0] for r in exact.select(F.greatest("id_a", "id_b").alias("d")).distinct().collect()
    }
    assert len(exact_dups) > 500  # the baseline itself is non-trivial

    recalls = {}
    for mode, n_probe, floor in [
        ("first_n", 1, 0.20),
        ("first_n", 2, 0.55),
        ("kmeans", 1, 0.30),
        ("kmeans", 2, 0.60),
    ]:
        dups = _dup_ids(
            semantic_dedup(e, n_clusters=16, threshold=0.40, centroids=mode, n_probe=n_probe, assign="exact")
        )
        assert not (dups - exact_dups), f"{mode} p{n_probe}: false positives"
        rec = len(dups & exact_dups) / len(exact_dups)
        recalls[(mode, n_probe)] = rec
        assert rec >= floor, f"{mode} n_probe={n_probe}: recall {rec:.3f} < floor {floor}"

    # multi-probe must strictly improve recall in both centroid modes
    assert recalls[("first_n", 2)] > recalls[("first_n", 1)]
    assert recalls[("kmeans", 2)] > recalls[("kmeans", 1)]


def test_lsh_assignment_agrees_with_exact_assignment_measured(spark, sf_dir):
    """``assign="lsh"`` (auto-k's linear assignment path, r8) is
    approximate: a vector lands on its nearest centroid AMONG PROBED
    BUCKETS, not the global argmax.  Measure the agreement against
    exact assignment at identical k and pin a floor — plus the two
    invariants that hold regardless: every vector is assigned exactly
    one rank-1 cell (the fallback guarantees total coverage), and in
    the design regime (planted near-identical copies, threshold 0.95)
    the planted dups are still caught because near-identical vectors
    share ALL their sign bits, not just their cell."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    exact = semantic_dedup(
        e, n_clusters="auto", threshold=0.40, n_probe=2, target_cell_size=24,
        assign="exact",
    ).select("vec_id", F.col("cluster_id").alias("c_exact"))
    lsh = semantic_dedup(
        e, n_clusters="auto", threshold=0.40, n_probe=2, target_cell_size=24,
        assign="lsh", dim=64,
    ).select("vec_id", F.col("cluster_id").alias("c_lsh"))
    assert lsh.count() == n  # total coverage: one rank-1 row per vector
    both = exact.join(lsh, "vec_id")
    agree = both.filter(F.col("c_exact") == F.col("c_lsh")).count()
    # measured agreement: 0.798 (sf0.001), 0.846 (sf0.01), 0.500
    # (sf0.1) on these near-uniform synthetic embeddings — the hardest
    # case for sign-LSH, since centroid margins are tiny so >=2-bit
    # flips are common (real clustered corpora agree far more); floor
    # at 0.40 to catch assignment regressions without pinning noise
    assert agree >= 0.40 * n

    # design regime: planted near-identical copies still dedup
    planted = e.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x * 1.02 + F.when(i == 0, F.lit(0.03)).otherwise(F.lit(0.0))
        ).alias("embedding"),
    )
    corpus = e.unionByName(planted)
    sd = semantic_dedup(
        corpus, n_clusters="auto", threshold=0.95, n_probe=1,
        target_cell_size=24, assign="lsh", dim=64,
    )
    flagged_planted = sd.filter(
        (~F.col("keep")) & (F.col("vec_id") >= 1_000_000)
    ).count()
    assert flagged_planted >= 0.85 * n


def test_lsh_assignment_rejects_mismatched_plane_width(spark, sf_dir):
    """dim != embedding width must fail loudly: zip_with pads with NULLs,
    so wrong-width planes silently send everything to bucket 0 and the
    'linear' path degrades to worse-than-exact (round-8 review)."""
    import pytest

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    with pytest.raises(ValueError, match="LSH planes must match"):
        semantic_dedup(
            e, n_clusters="auto", threshold=0.40, n_probe=2,
            target_cell_size=24, assign="lsh", dim=32,
        )


def test_default_call_is_scale_safe_lsh_with_inferred_dim(spark, sf_dir):
    """Round-9 API contract (VERDICT r8 item #1): semantic_dedup's
    DEFAULTS are the scale-safe configuration — n_clusters="auto",
    assign="lsh", plane width inferred from the corpus.  A bare
    semantic_dedup(e) must (a) run the LSH-assign path (identical
    output to the explicit lshassign configuration at the same knobs),
    (b) emit exactly one rank-1 row per vector, and (c) never leave a
    vector unassigned."""
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    bare = semantic_dedup(e, threshold=0.40, n_probe=2, target_cell_size=24)
    explicit = semantic_dedup(
        e, n_clusters="auto", threshold=0.40, n_probe=2,
        target_cell_size=24, assign="lsh", dim=64,
    )
    a = sorted(map(tuple, bare.collect()))
    b = sorted(map(tuple, explicit.collect()))
    assert a == b and len(a) == n
    assert all(r[1] is not None for r in a)  # every vector got a cell
