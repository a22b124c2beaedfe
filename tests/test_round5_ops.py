"""Unit/property tests for the round-5 operators: exact heavy hitters
(Misra-Gries candidates), substring-window dedup, blocked fuzzy join,
and the equi-depth histogram.  (The s13 stream-stream left-outer twin is
covered in test_streaming.py alongside its streaming form.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.operators.heavy_hitters import (
    heavy_hitters_exact,
    misra_gries_candidates,
)
from factory_inspectors_db_etl_spark.plans.catalog_ext import (
    _EQD_BUCKETS,
    _FUZZY_MAX_DIST,
    _HH_K,
    q_a12_equidepth_histogram,
    q_a13_heavy_hitters,
    q_d_substring_dedup,
    q_j12_fuzzy_blocked_join,
)
from factory_inspectors_db_etl_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# A13 heavy hitters
# ---------------------------------------------------------------------------


def _exact_hh_baseline(df, col, k):
    n = df.count()
    return {
        (r[col], r["cnt"])
        for r in df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r["cnt"] * k > n
    }


def test_heavy_hitters_matches_plain_groupby_on_skewed_data(spark):
    """The two-stage MG pipeline must equal the exact GROUP BY/HAVING
    answer on adversarial skew: a Zipf-ish head plus a long tail of
    singletons (the open-vocabulary case the bounded state exists for),
    spread across many partitions so per-partition summaries actually
    merge."""
    rows = []
    for i, freq in enumerate([4000, 2500, 1200, 600, 200, 90, 40]):
        rows += [(f"head{i}",)] * freq
    rows += [(f"tail{j}",) for j in range(5000)]
    df = spark.createDataFrame(rows, "token string").repartition(16)
    for k in (5, 10, 50):
        want = _exact_hh_baseline(df, "token", k)
        got = {
            (r["token"], r["cnt"])
            for r in heavy_hitters_exact(df, "token", k).collect()
        }
        assert got == want, f"k={k}"


def test_heavy_hitters_share_is_exact_ratio(spark):
    df = spark.createDataFrame([("a",)] * 30 + [("b",)] * 10, "token string")
    out = {r["token"]: r for r in heavy_hitters_exact(df, "token", 3).collect()}
    # n=40, threshold n/3=13.33 -> only 'a' (30) qualifies
    assert set(out) == {"a"}
    assert out["a"]["cnt"] == 30
    assert out["a"]["share"] == 30 / 40


def test_mg_candidates_are_superset_and_bounded(spark):
    """Candidate-set contract: contains every true heavy hitter and is
    bounded by partitions * k even when the vocabulary is much larger."""
    rows = [("hot",)] * 3000 + [(f"cold{j}",) for j in range(8000)]
    df = spark.createDataFrame(rows, "token string").repartition(8)
    k = 10
    cands = {r["token"] for r in misra_gries_candidates(df, "token", k).collect()}
    assert "hot" in cands
    assert len(cands) <= 8 * k


def test_a13_query_thresholds_are_integers(spark, sf_dir):
    """Every returned row satisfies the strict integer inequality, and no
    sub-threshold token leaks through."""
    out = q_a13_heavy_hitters(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n = docs.select(
        F.explode(F.split("text", " ")).alias("t")
    ).filter(F.col("t") != "").count()
    assert out and all(r["cnt"] * _HH_K > n for r in out)


# ---------------------------------------------------------------------------
# D substring dedup
# ---------------------------------------------------------------------------


def test_substring_dedup_planted_shared_span(spark, tmp_path):
    """Two docs sharing a long exact span show dup windows; a unique doc
    shows zero.  Window/stride arithmetic is pinned by construction:
    a doc shorter than the window gets exactly one window."""
    shared = "x" * 40 + "the quick brown fox jumps over the lazy dog" + "y" * 40
    rows = [
        (1, "A" * 300 + shared, "en", "s", 0),
        (2, shared + "B" * 300, "en", "s", 0),
        (3, "unique content here that matches nothing else at all....." * 6, "en", "s", 0),
        (4, "tiny", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in q_d_substring_dedup(spark, str(tmp_path)).collect()}
    assert out[1]["n_dup_windows"] > 0 and out[2]["n_dup_windows"] > 0
    assert out[3]["n_dup_windows"] == 0
    assert out[4]["n_windows"] == 1  # shorter than the window -> whole text
    for r in out.values():
        assert r["dup_frac"] == r["n_dup_windows"] / r["n_windows"]


def test_substring_dedup_totals(spark, sf_dir):
    out = q_d_substring_dedup(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    assert out.count() == docs.count()  # one row per doc
    bad = out.filter(
        (F.col("n_dup_windows") > F.col("n_windows"))
        | (F.col("dup_frac") < 0)
        | (F.col("dup_frac") > 1)
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# J12 blocked fuzzy join
# ---------------------------------------------------------------------------


def test_fuzzy_join_matches_bruteforce_within_block(spark, sf_dir):
    """Every emitted pair is block-consistent with dist<=2, and the query
    finds ALL such pairs (brute force over the same blocking policy)."""
    import itertools

    got = {
        (r["key_a"], r["key_b"], r["dist"])
        for r in q_j12_fuzzy_blocked_join(spark, sf_dir).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand"
    ).collect()
    want = set()
    for x, y in itertools.combinations(parts, 2):
        a, b = (x, y) if x["p_partkey"] > y["p_partkey"] else (y, x)
        if (
            a["p_brand"] == b["p_brand"]
            and len(a["p_name"]) == len(b["p_name"])
            and a["p_name"] != b["p_name"]
        ):
            d = lev(a["p_name"], b["p_name"])
            if d <= _FUZZY_MAX_DIST:
                want.add((a["p_partkey"], b["p_partkey"], d))
    assert got == want and want  # non-trivial at sf0.001


def test_fuzzy_join_plan_is_equi_join_not_cartesian(spark, sf_dir):
    plan = (
        q_j12_fuzzy_blocked_join(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# A12 equi-depth histogram
# ---------------------------------------------------------------------------


def test_equidepth_buckets_are_balanced_and_cover(spark, sf_dir):
    rows = q_a12_equidepth_histogram(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "orders").count()
    assert {r["bucket"] for r in rows} == set(range(_EQD_BUCKETS))
    assert sum(r["n_orders"] for r in rows) == n
    # equi-depth: every bucket within 2x of the ideal n/k (ties can
    # imbalance, but the synthetic price domain is near-continuous)
    ideal = n / _EQD_BUCKETS
    for r in rows:
        assert 0.5 * ideal <= r["n_orders"] <= 2 * ideal, rows
    # buckets tile the value axis in order without overlap
    srt = sorted(rows, key=lambda r: r["bucket"])
    for lo_r, hi_r in zip(srt, srt[1:]):
        assert lo_r["hi"] <= hi_r["lo"]


# ---------------------------------------------------------------------------
# D incremental dedup (delta vs base corpus)
# ---------------------------------------------------------------------------


def test_incremental_dedup_probe_semantics(spark):
    """Planted semantics: a delta doc duplicating a BASE doc is flagged;
    a delta doc duplicating only a LATER delta doc is kept (the later
    one is flagged — deterministic earlier-arrival tiebreak); a unique
    delta doc is kept.  Base docs never appear in the output."""
    from factory_inspectors_db_etl_spark.operators.dedup import (
        incremental_lsh_dup_flags,
        minhash_signatures,
    )

    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    long_b = "one two three four five six seven eight nine ten eleven " * 8
    uniq = "completely different content with no overlap whatsoever here " * 8
    rows = [
        (0, long_a, False),   # base
        (1, long_b, True),    # delta, dups only doc 3 (later delta) -> kept
        (2, long_a, True),    # delta, dups base doc 0 -> flagged
        (3, long_b, True),    # delta, dups earlier delta doc 1 -> flagged
        (4, uniq, True),      # delta, unique -> kept
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    flags = spark.createDataFrame(
        [(i, d) for i, _, d in rows], "doc_id long, is_delta boolean"
    )
    sigs = minhash_signatures(df, "doc_id", "text", k=5, num_hashes=64)
    out = {r["doc_id"]: r for r in incremental_lsh_dup_flags(sigs, flags).collect()}
    assert set(out) == {1, 2, 3, 4}  # delta docs only
    assert not out[1]["is_dup"] and out[1]["n_dup_sources"] == 0
    assert out[2]["is_dup"] and out[2]["n_dup_sources"] == 1
    assert out[3]["is_dup"] and out[3]["n_dup_sources"] == 1
    assert not out[4]["is_dup"]


def test_incremental_dedup_agrees_with_full_lsh(spark, sf_dir):
    """Consistency with the full corpus-wide LSH pair join: a delta doc
    is flagged iff d_minhash_lsh emits a candidate pair linking it to a
    base doc or a smaller-id delta doc."""
    from factory_inspectors_db_etl_spark.plans.catalog import (
        QUERIES,
        q_d_incremental_dedup,
    )

    pairs = QUERIES["d_minhash_lsh"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    from factory_inspectors_db_etl_spark.operators.dedup import portable_hash60

    delta = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", (F.pmod(portable_hash60(F.col("text")), F.lit(5)) == 0).alias("d")
        ).collect()
        if r["d"]
    }
    want_dup = set()
    for r in pairs:
        a, b = r["id_a"], r["id_b"]  # a < b by construction
        if b in delta:  # partner is base or an earlier (smaller-id) doc
            want_dup.add(b)
        if a in delta and b in delta:
            pass  # b already flagged above; a only dups a LATER delta -> not via this pair
        elif a in delta and b not in delta:
            want_dup.add(a)  # base partner with larger id still counts
    got = {r["doc_id"]: r["is_dup"] for r in q_d_incremental_dedup(spark, sf_dir).collect()}
    assert set(got) == delta
    assert {d for d, f in got.items() if f} == want_dup


# ---------------------------------------------------------------------------
# LSH near-dup: exact-duplicate collapse (duplicate-dense corpus guard)
# ---------------------------------------------------------------------------


def test_lsh_neardup_collapse_is_bit_identical(spark, sf_dir):
    """collapse_exact must be a pure plan optimization: bit-identical
    output on a clean corpus AND on a duplicate-dense one (every vector
    twice — the regime where the un-collapsed bucket join goes quadratic
    in the duplication factor; measured 232s -> 9.8s at sf1)."""
    from factory_inspectors_db_etl_spark.operators.similarity import (
        embedding_neardup_pairs_lsh,
    )

    e = load_table(spark, sf_dir, "embeddings")
    for corpus in (
        e,
        e.unionByName(
            e.selectExpr("vec_id + 100000 AS vec_id", "embedding", "label")
        ),
    ):
        old = sorted(
            tuple(r)
            for r in embedding_neardup_pairs_lsh(
                corpus, dim=64, threshold=0.40, collapse_exact=False
            ).collect()
        )
        new = sorted(
            tuple(r)
            for r in embedding_neardup_pairs_lsh(
                corpus, dim=64, threshold=0.40, collapse_exact=True
            ).collect()
        )
        assert old == new and new


def test_heavy_hitters_on_bigint_keys(spark, sf_dir):
    """The MG schema derives from the input column type (review finding):
    bigint keys must work end-to-end and match the exact baseline."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("k")
    )
    want = _exact_hh_baseline(li, "k", 40)
    got = {(r["k"], r["cnt"]) for r in heavy_hitters_exact(li, "k", 40).collect()}
    assert got == want and want  # 10 uniform suppliers, all above n/40


def test_deletion_join_finds_indel_variants_blocked_join_misses(spark, tmp_path):
    """j12b's deletion-neighborhood candidates are lossless for lev<=2:
    on planted insert/delete variants (different lengths — invisible to
    j12's same-length blocking) it finds exactly the brute-force pair
    set, and strictly more than j12."""
    from factory_inspectors_db_etl_spark.plans.catalog_ext import (
        q_j12b_deletion_join,
    )

    rows = [
        (1, "red widget", "Brand#1", "t", 1, 1.0),
        (2, "red widgets", "Brand#1", "t", 1, 1.0),   # 1 insert
        (3, "rd widget", "Brand#1", "t", 1, 1.0),     # 1 delete
        (4, "red gadget", "Brand#1", "t", 1, 1.0),    # 2 subs (same len)
        (5, "blue bolt", "Brand#1", "t", 1, 1.0),     # far away
        (6, "red widget", "Brand#2", "t", 1, 1.0),    # other brand
        (7, "x", "Brand#3", "t", 1, 1.0),             # len<2 edge
        (8, "xy", "Brand#3", "t", 1, 1.0),
    ]
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.parquet(str(tmp_path / "part.parquet"))
    got = {
        (r["key_a"], r["key_b"], r["dist"])
        for r in q_j12b_deletion_join(spark, str(tmp_path)).collect()
    }
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = set()
    for x, y in itertools.combinations(rows, 2):
        a, b = (x, y) if x[0] > y[0] else (y, x)
        if a[2] == b[2] and a[1] != b[1] and lev(a[1], b[1]) <= 2:
            want.add((a[0], b[0], lev(a[1], b[1])))
    assert got == want
    # and the different-length pair (1,2) is present — the j12 blind spot
    assert (2, 1, 1) in got
