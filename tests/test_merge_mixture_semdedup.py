"""Round-4 operators: CDC merge/upsert (operators/merge.py), data-mixture
resampling (sampling.mixture_sample), SemDeDup-style semantic dedup
(similarity.semantic_dedup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.operators.merge import apply_cdc, latest_changes
from factory_inspectors_db_etl_spark.operators.sampling import mixture_sample
from factory_inspectors_db_etl_spark.operators.similarity import (
    embedding_neardup_pairs,
    semantic_dedup,
)


# ---------------------------------------------------------------------------
# CDC merge
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cdc(spark):
    base = spark.createDataFrame(
        [(1, "one", 10.0), (2, "two", 20.0), (3, "three", 30.0), (4, "four", 40.0)],
        ["k", "name", "bal"],
    )
    changes = spark.createDataFrame(
        [
            # k=1: two updates, v=2 wins
            (1, "one-a", 11.0, "U", 1),
            (1, "one-b", 12.0, "U", 2),
            # k=2: update then delete -> deleted
            (2, "two-a", 21.0, "U", 1),
            (2, "two-x", 0.0, "D", 2),
            # k=3: delete then a LATER update -> resurrected
            (3, "gone", 0.0, "D", 1),
            (3, "three-b", 33.0, "U", 2),
            # k=5: brand-new key -> insert
            (5, "five", 50.0, "I", 1),
        ],
        ["k", "name", "bal", "op", "v"],
    )
    return base, changes


def test_latest_changes_is_last_writer_wins(cdc):
    _, changes = cdc
    latest = {r["k"]: (r["name"], r["v"]) for r in latest_changes(changes, ["k"], ["v"]).collect()}
    assert latest == {1: ("one-b", 2), 2: ("two-x", 2), 3: ("three-b", 2), 5: ("five", 1)}


def test_apply_cdc_insert_update_delete_passthrough(cdc):
    base, changes = cdc
    out = {r["k"]: (r["name"], r["bal"]) for r in apply_cdc(base, changes, ["k"], ["v"]).collect()}
    assert out == {
        1: ("one-b", 12.0),   # latest update wins
        3: ("three-b", 33.0), # delete superseded by later update
        4: ("four", 40.0),    # untouched passthrough
        5: ("five", 50.0),    # insert of a new key
    }  # k=2 deleted


def test_apply_cdc_preserves_base_schema(cdc):
    base, changes = cdc
    assert apply_cdc(base, changes, ["k"], ["v"]).columns == base.columns


def test_apply_cdc_composite_key_and_version(spark):
    base = spark.createDataFrame([(1, "a", 1.0), (1, "b", 2.0)], ["k1", "k2", "x"])
    changes = spark.createDataFrame(
        # same ts, change-id tiebreak: id=2 wins
        [(1, "a", 9.0, "U", 10, 1), (1, "a", 7.0, "U", 10, 2)],
        ["k1", "k2", "x", "op", "ts", "cid"],
    )
    out = {(r["k1"], r["k2"]): r["x"] for r in apply_cdc(base, changes, ["k1", "k2"], ["ts", "cid"]).collect()}
    assert out == {(1, "a"): 7.0, (1, "b"): 2.0}


def test_apply_cdc_plan_has_no_cartesian(cdc):
    base, changes = cdc
    plan = apply_cdc(base, changes, ["k"], ["v"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# ---------------------------------------------------------------------------
# Mixture sampling
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(2000):
        lang = ["en", "en", "en", "en", "en", "en", "de", "de", "fr", "zh"][i % 10]
        rows.append((i, f"doc {i} text body", lang))
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"]).cache()


def test_mixture_hits_target_proportions(corpus):
    # corpus is 60% en / 20% de / 10% fr / 10% zh; ask for an even 3-way mix
    out = mixture_sample(corpus, "text", "lang", {"en": 1 / 3, "de": 1 / 3, "fr": 1 / 3})
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "zh" not in counts  # absent from the target mixture -> dropped
    # fr (200 rows) binds: everything targets ~200 per language
    assert counts["fr"] == 200  # binding stratum keeps 100%
    for lang in ("en", "de"):
        assert abs(counts[lang] - 200) / 200 < 0.15  # hash granularity tolerance


def test_mixture_never_upsamples_and_is_deterministic(corpus):
    out1 = mixture_sample(corpus, "text", "lang", {"en": 0.9, "fr": 0.1})
    per = {r["lang"]: r["n"] for r in out1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per["en"] <= 1200 and per["fr"] <= 200
    ids1 = sorted(r["doc_id"] for r in out1.collect())
    ids2 = sorted(
        r["doc_id"] for r in mixture_sample(corpus, "text", "lang", {"en": 0.9, "fr": 0.1}).collect()
    )
    assert ids1 == ids2


def test_mixture_weights_are_normalized(corpus):
    a = sorted(r["doc_id"] for r in mixture_sample(corpus, "text", "lang", {"en": 1, "de": 1}).collect())
    b = sorted(r["doc_id"] for r in mixture_sample(corpus, "text", "lang", {"en": 0.5, "de": 0.5}).collect())
    assert a == b


def test_mixture_rejects_bad_weights(corpus):
    with pytest.raises(ValueError):
        mixture_sample(corpus, "text", "lang", {})
    with pytest.raises(ValueError):
        mixture_sample(corpus, "text", "lang", {"en": 0.0})


def test_mixture_corpus_scan_not_shuffled(corpus):
    """The corpus side reaches the output through a broadcast join of the
    tiny rate table — no exchange on the corpus branch (the only
    shuffles are the per-stratum count aggregation, whose input is
    column-pruned to the stratum column)."""
    out = mixture_sample(corpus, "text", "lang", {"en": 0.5, "de": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# Semantic dedup
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vectors(spark):
    import math
    import random

    rng = random.Random(11)
    rows = []
    for i in range(120):
        if i >= 100 and i % 2 == 0:
            # planted near-dup of an earlier vector (tiny perturbation)
            src = rows[i - 100][1]
            v = [x + rng.uniform(-1e-3, 1e-3) for x in src]
        else:
            v = [rng.gauss(0, 1) for _ in range(16)]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / n for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_semantic_dedup_drops_planted_dups_keeps_lowest_id(vectors):
    out = {r["vec_id"]: r for r in semantic_dedup(vectors, n_clusters=8, threshold=0.98, assign="exact").collect()}
    assert len(out) == 120  # every vector gets a verdict row
    for i in range(100, 120, 2):
        src = i - 100
        # planted copy lands in the source's cluster and is dropped;
        # the lower-id source survives
        assert out[i]["cluster_id"] == out[src]["cluster_id"]
        assert out[i]["keep"] is False
        assert out[src]["keep"] is True


def test_semantic_dedup_within_cluster_agrees_with_bruteforce(vectors):
    """Every within-cluster brute-force near-dup pair must be reflected:
    the higher id of each pair is dropped (greedy keep-lowest-id)."""
    res = semantic_dedup(vectors, n_clusters=8, threshold=0.98, assign="exact")
    clusters = {r["vec_id"]: r["cluster_id"] for r in res.collect()}
    kept = {r["vec_id"] for r in res.collect() if r["keep"]}
    pairs = embedding_neardup_pairs(vectors, threshold=0.98).collect()
    within = [(p["id_a"], p["id_b"]) for p in pairs if clusters[p["id_a"]] == clusters[p["id_b"]]]
    assert within  # the planted dups land in-cluster
    for a, b in within:
        assert max(a, b) not in kept or min(a, b) not in kept


def test_semantic_dedup_pair_join_is_equi_not_cartesian(vectors):
    plan = semantic_dedup(vectors, n_clusters=8, threshold=0.98, assign="exact")._jdf.queryExecution().executedPlan().toString()
    # the only nested-loop is the broadcast against the tiny centroid
    # set; the pair search itself must be an equi-join on the cluster id
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoop") <= 1


def test_semantic_dedup_kmeans_variant_same_contract(vectors):
    out = semantic_dedup(vectors, n_clusters=4, threshold=0.98, centroids="kmeans", assign="exact")
    rows = out.collect()
    assert len(rows) == 120
    dropped = {r["vec_id"] for r in rows if not r["keep"]}
    # trained centroids still put each planted dup with its source
    assert {i for i in range(100, 120, 2)} <= dropped


def test_apply_cdc_null_op_is_upsert_not_delete(spark):
    """A NULL op must behave as an upsert: with a plain != predicate it
    evaluates to NULL, drops out of the upserts, and the key silently
    vanishes (the anti join still removes the base row)."""
    base = spark.createDataFrame([(1, "one", 1.0)], ["k", "name", "bal"])
    changes = spark.createDataFrame(
        [(1, "one-null-op", 9.0, None, 1)], "k int, name string, bal double, op string, v int"
    )
    out = {r["k"]: (r["name"], r["bal"]) for r in apply_cdc(base, changes, ["k"], ["v"]).collect()}
    assert out == {1: ("one-null-op", 9.0)}
