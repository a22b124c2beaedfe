"""Scale-path behavior of the near-dup operators: the blocked distributed
exact form must equal the columnar exact form, the LSH candidates+rescore
pipeline must be a pure-recall approximation (no false positives), the
broadcast-matrix form must refuse oversized inputs, and the n-gram
Jaccard stop-shingle cap must bound hot postings without changing results
on corpora below the cap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.operators.dedup import ngram_jaccard_pairs
from factory_inspectors_db_etl_spark.operators.similarity import (
    cosine_topk_bruteforce,
    embedding_neardup_pairs,
    embedding_neardup_pairs_blocked,
    embedding_neardup_pairs_lsh,
    embedding_neardup_pairs_matrix,
    ivf_topk,
)
from factory_inspectors_db_etl_spark.sources.tables import load_table

THRESHOLD = 0.40


def _pairs(df):
    return {(r["id_a"], r["id_b"]): r["cosine"] for r in df.collect()}


@pytest.fixture(scope="module")
def exact_pairs(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return _pairs(embedding_neardup_pairs(e, threshold=THRESHOLD))


def test_blocked_equals_exact(spark, sf_dir, exact_pairs):
    e = load_table(spark, sf_dir, "embeddings")
    # 100-row blocks over 500 vectors -> 5 blocks, 15 block pairs: the
    # multi-block path (diagonal + off-diagonal tasks) is what's tested
    got = _pairs(
        embedding_neardup_pairs_blocked(e, threshold=THRESHOLD, target_block_rows=100)
    )
    assert set(got) == set(exact_pairs)
    assert all(abs(got[k] - exact_pairs[k]) < 1e-9 for k in got)


def test_blocked_single_block_degenerate(spark, sf_dir, exact_pairs):
    e = load_table(spark, sf_dir, "embeddings")
    got = _pairs(embedding_neardup_pairs_blocked(e, threshold=THRESHOLD, n_blocks=1))
    assert set(got) == set(exact_pairs)


def test_lsh_rescore_no_false_positives_and_high_recall(spark, sf_dir, exact_pairs):
    e = load_table(spark, sf_dir, "embeddings")
    got = _pairs(embedding_neardup_pairs_lsh(e, dim=64, threshold=THRESHOLD))
    # exact rescore: every emitted pair is a true pair with the true score
    assert set(got) <= set(exact_pairs)
    assert all(abs(got[k] - exact_pairs[k]) < 1e-9 for k in got)
    # recall at this LOW threshold is ~1-(1-p^4)^16 with p~0.63 -> ~0.94;
    # assert a conservative floor (at the 0.95 design point it is ~1-5e-8)
    assert len(got) >= 0.75 * len(exact_pairs)


def test_ivf_kmeans_recall_floor_vs_bruteforce_and_deterministic(spark, sf_dir):
    """The KMeans-centroid IVF variant (VERDICT r3 item #4): recall@5
    measured against exact brute force must clear the 0.35 contract
    floor of q_sim_ivf_topk_kmeans; the deterministic first-n variant is
    measured alongside.  On the synthetic embeddings (unit-norm,
    direction-uniform — no cluster structure, IVF's worst case) the
    data-point anchors win (~0.92 vs ~0.62); the kmeans path is the
    production choice for real, clustered corpora."""
    e = load_table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(e, qs, k=5).select("query_id", "neighbor_id")
    n_exact = exact.count()
    assert n_exact == 50

    def recall(df):
        return df.select("query_id", "neighbor_id").join(
            exact, ["query_id", "neighbor_id"]
        ).count() / n_exact

    km = recall(ivf_topk(e, qs, k=5, n_centroids=16, n_probe=4, centroids="kmeans"))
    det = recall(ivf_topk(e, qs, k=5, n_centroids=16, n_probe=4))
    assert km >= 0.35, f"kmeans recall {km} under contract floor"
    assert det >= 0.35, f"first_n recall {det} under contract floor"


def test_ivf_unknown_centroid_mode_raises(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="annoy"):
        ivf_topk(e, e.limit(1), centroids="annoy")


def test_matrix_form_size_guard(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="broadcast guard"):
        # 500 x 64 doubles = 256 KB > 1 KB guard
        embedding_neardup_pairs_matrix(e, threshold=THRESHOLD, max_broadcast_bytes=1024)


def test_ngram_max_df_caps_hot_shingle(spark):
    # 12 docs sharing one hot 3-gram prefix + 2 genuine near-dups
    hot = [(i, f"alpha beta gamma filler{i} tail{i} end{i}") for i in range(12)]
    near = [
        (100, "one two three four five six seven"),
        (101, "one two three four five six eight"),
    ]
    df = spark.createDataFrame(hot + near, "doc_id long, text string")
    # cap at 10: the hot shingle (df=12) is dropped, so the hot docs share
    # nothing and generate NO pairs; the near-dup pair survives untouched
    capped = ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.1, max_df=10)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(100, 101)}
    # uncapped: the hot shingle generates all 66 hot pairs
    exact = ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.1, max_df=None)
    assert exact.count() == 66 + 1


def test_ngram_default_cap_is_noop_below_cap(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    capped = ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.5)
    exact = ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.5, max_df=None)
    assert _pairs_j(capped) == _pairs_j(exact)


def _pairs_j(df):
    return {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in df.collect()}


# ---------------------------------------------------------------------------
# connected components / cluster assignment
# ---------------------------------------------------------------------------


def test_connected_components_chain_and_island(spark):
    from factory_inspectors_db_etl_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3: exercises multi-round propagation) plus
    # separate pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_max_iters_raises(spark):
    from factory_inspectors_db_etl_spark.operators.dedup import connected_components

    # a 30-node chain needs ~29 min-propagation rounds to converge; with
    # max_iters=2 the operator must raise rather than return a silently
    # unconverged labeling
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=2)


def test_connected_components_converges_with_headroom(spark):
    from factory_inspectors_db_etl_spark.operators.dedup import connected_components

    # same chain with enough rounds: one component labeled by the min node
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(11)}


def test_large_star_agrees_with_min_propagation(spark):
    from factory_inspectors_db_etl_spark.operators.dedup import (
        connected_components,
        connected_components_large_star,
    )

    # chain + clique + singleton-pair + self-pair: every structural case
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21), (30, 30)],
        "id_a long, id_b long",
    )
    want = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    got = {r["node"]: r["component"] for r in connected_components_large_star(pairs).collect()}
    assert got == want


def test_large_star_converges_on_long_chain(spark):
    from factory_inspectors_db_etl_spark.operators.dedup import (
        connected_components_large_star,
    )

    # a 60-node chain: min-propagation needs ~59 rounds (raises at the
    # default 25); large-star/small-star is O(log^2 n) and must converge
    # comfortably inside 20 rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    got = {r["node"]: r["component"] for r in connected_components_large_star(pairs).collect()}
    assert got == {i: 0 for i in range(61)}


def test_assign_components_auto_falls_back_on_long_chain(spark):
    from factory_inspectors_db_etl_spark.operators.dedup import assign_components

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    # 40-node chain: min-label would raise at max_iters=3; auto must fall
    # back to large-star and produce the correct single cluster
    pairs = spark.createDataFrame([(i, i + 1) for i in range(39)], "id_a long, id_b long")
    got = assign_components(docs, pairs, max_iters=3, algorithm="auto")
    rows = {r["doc_id"]: (r["component_id"], r["is_canonical"]) for r in got.collect()}
    assert all(c == 0 for c, _ in rows.values())
    assert [d for d, (_, canon) in rows.items() if canon] == [0]


def test_pq_topk_contract_and_plan(spark, sf_dir):
    """PQ/ADC top-k: full verdict coverage per query, codes bounded,
    no cartesian in the plan, and approximate neighbors overlap the
    exact brute-force top-k far better than chance."""
    from factory_inspectors_db_etl_spark.operators.similarity import (
        cosine_topk_bruteforce,
        pq_topk,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 10)
    approx = pq_topk(e, qs, dim=64, k=5, m=8, codewords=16)
    rows = approx.collect()
    assert {r["query_id"] for r in rows} == set(range(10))
    assert all(1 <= r["rank"] <= 5 for r in rows)

    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    exact = cosine_topk_bruteforce(e, qs, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(
        1 for r in rows if r["neighbor_id"] in exact_sets[r["query_id"]]
    )
    n_corpus = e.count()
    # chance overlap of two 5-sets from n_corpus candidates is ~25/n;
    # require at least 20% recall — far above chance for any real corpus
    assert hits / (5 * 10) >= 0.2, f"PQ recall {hits}/50 vs exact top-5"
