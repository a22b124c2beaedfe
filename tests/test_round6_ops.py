"""Round-6 operator tests: real PNG codec round-trip, TF-IDF cosine
join vs brute force, catalog-level WCC vs union-find, skyline vs
quadratic dominance scan, interval-alignment conservation, novelty
bounds, HHI bounds, RFM tiling, reservoir determinism, and the two
ADVICE hardening fixes (bloom scratch-name collisions, sqlite column
validation)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.operators.multimodal import (
    _parse_png,
    decode_png,
    encode_png,
)
from factory_inspectors_db_etl_spark.operators.setsim import (
    bruteforce_tfidf_cosine_pairs,
    tfidf_cosine_pairs,
)
from factory_inspectors_db_etl_spark.plans.catalog_ext4 import (
    q_a22_hhi_concentration,
    q_g5_wcc,
    q_j18_interval_align,
    q_o8_skyline_2d,
    q_p_reservoir_sample,
    q_t_ngram_novelty,
    q_w28_rfm_segmentation,
)
from factory_inspectors_db_etl_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# PNG codec
# ---------------------------------------------------------------------------


def _pixels(h: int, w: int, seed: int) -> np.ndarray:
    # deterministic pseudo-random-ish pixels without RNG state
    i = np.arange(h * w * 3, dtype="int64")
    return ((i * 2654435761 + seed * 97) % 256).astype("u1").reshape(h, w, 3)


@pytest.mark.parametrize("h,w", [(1, 1), (1, 7), (7, 1), (6, 5), (8, 8), (11, 3)])
def test_png_roundtrip_exact(h, w):
    px = _pixels(h, w, h * 31 + w)
    payload = encode_png(px)
    rw, rh, out = _parse_png(payload)
    assert (rw, rh) == (w, h)
    assert np.array_equal(out, px)


def test_png_all_five_filters_exercised_and_inverted():
    # h >= 5 guarantees filter types 0..4 all appear (row % 5 rotation)
    px = _pixels(9, 4, 123)
    payload = encode_png(px)
    # extremes stress Average/Paeth carry behavior
    px2 = np.zeros((5, 3, 3), dtype="u1")
    px2[::2] = 255
    assert np.array_equal(_parse_png(encode_png(px2))[2], px2)
    assert np.array_equal(_parse_png(payload)[2], px)


def test_png_crc_corruption_detected():
    payload = bytearray(encode_png(_pixels(5, 5, 7)))
    # flip a byte inside the IDAT body (after sig+IHDR chunk = 8+25 bytes,
    # skip the 8-byte IDAT header too)
    payload[8 + 25 + 8 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _parse_png(bytes(payload))


def test_png_rejects_non_png_and_features_are_exact_ratios():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    px = _pixels(4, 6, 55)
    feats = decode_png(encode_png(px))
    npx = 4 * 6
    assert feats[0] == 6.0 and feats[1] == 4.0 and feats[2] == 3.0
    assert feats[3] == int(px[:, :, 0].astype("int64").sum()) / (npx * 255)
    assert feats[6] == int(px.astype("int64").sum()) / (npx * 3 * 255)
    assert feats[7] == 6 / 4


# ---------------------------------------------------------------------------
# TF-IDF cosine join
# ---------------------------------------------------------------------------


def test_tfidf_cosine_prefix_filter_is_lossless(spark, sf_dir):
    """The registered (prefix-filtered, collapsed) operator must equal
    the unfiltered, uncollapsed brute force — zero false negatives from
    the suffix-norm prefix, zero perturbation from the duplicate
    collapse."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    fast = tfidf_cosine_pairs(p, "p_partkey", "p_name", 3, 5).toPandas()
    brute = bruteforce_tfidf_cosine_pairs(p, "p_partkey", "p_name", 3, 5).toPandas()
    key = ["id_a", "id_b"]
    fast = fast.sort_values(key).reset_index(drop=True)
    brute = brute.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, brute, check_exact=True)


def test_tfidf_cosine_planted_variants(spark):
    """Planted corpus: exact duplicates, a rare-word near-match, and a
    common-word-only pair.  Rare-word sharing must qualify, ubiquitous
    words alone must not, duplicates always pair."""
    rows = [
        (1, "zephyr quartz marble alpha beta"),
        (2, "zephyr quartz marble alpha beta"),  # exact dup of 1
        (3, "zephyr quartz marble alpha delta"),  # 4 shared heavy words
        (4, "plain common words only here"),
        (5, "plain common words only there"),
        (6, "delta beta filler goes here"),  # keeps delta/beta non-unique
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_cosine_pairs(df, "doc_id", "text", 3, 5).toPandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].values))
    assert (1, 2) in pairs  # exact duplicate
    assert (1, 3) in pairs and (2, 3) in pairs  # rare-word near match
    assert (1, 6) not in pairs  # one shared common word is not enough
    brute = bruteforce_tfidf_cosine_pairs(df, "doc_id", "text", 3, 5).toPandas()
    assert pairs == set(map(tuple, brute[["id_a", "id_b"]].values))
    # duplicate pair carries symmetric norms and cosine exactly as brute
    m = (
        out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    b = brute.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(m, b, check_exact=True)


# ---------------------------------------------------------------------------
# G5 WCC vs union-find
# ---------------------------------------------------------------------------


def test_g5_wcc_matches_union_find(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = li.join(urgent, li["l_orderkey"] == urgent["o_orderkey"]).select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        .toPandas()
    )
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges[["u", "v"]].values:
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-id relabel: component = min node in tree
    expected = {}
    for node in parent:
        expected[node] = find(node)
    got = q_g5_wcc(spark, sf_dir).toPandas()
    got_map = dict(zip(got["part_id"].astype(int), got["component"].astype(int)))
    assert got_map == expected


# ---------------------------------------------------------------------------
# O8 skyline vs quadratic scan
# ---------------------------------------------------------------------------


def test_o8_skyline_matches_bruteforce(spark, sf_dir):
    p = load_table(spark, sf_dir, "part").toPandas()
    cents = (p["p_retailprice"].astype(float) * 100).round().astype(int)
    size = p["p_size"].astype(int)
    keep = []
    for i in range(len(p)):
        dominated = (
            ((cents < cents[i]) & (size >= size[i]))
            | ((cents == cents[i]) & (size > size[i]))
        ).any()
        if not dominated:
            keep.append(int(p["p_partkey"][i]))
    got = sorted(q_o8_skyline_2d(spark, sf_dir).toPandas()["p_partkey"].astype(int))
    assert got == sorted(keep)


# ---------------------------------------------------------------------------
# J18 interval alignment: conservation + cell bounds
# ---------------------------------------------------------------------------


def test_j18_overlaps_sum_to_session_duration(spark, sf_dir):
    out = q_j18_interval_align(spark, sf_dir)
    # each cell's overlap is within one hour
    bounds = out.agg(
        F.min("overlap_us").alias("lo"), F.max("overlap_us").alias("hi")
    ).collect()[0]
    assert bounds["lo"] >= 0 and bounds["hi"] <= 3_600_000_000
    # per-session overlap total equals the session's end-start span
    sums = out.groupBy("user_id", "session_idx").agg(
        F.sum("overlap_us").alias("total_us")
    )
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_break = F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")
    new_s = F.when(gap_break | F.lag("ts").over(w).isNull(), 1).otherwise(0)
    sess = (
        ev.withColumn("_new", new_s)
        .withColumn(
            "session_idx",
            F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("int"),
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").cast("long").alias("span_us")
        )
    )
    joined = sums.join(sess, ["user_id", "session_idx"])
    bad = joined.filter(F.col("total_us") != F.col("span_us")).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# bounds / determinism checks for the lighter round-6 queries
# ---------------------------------------------------------------------------


def test_t_ngram_novelty_bounds_and_first_doc(spark, sf_dir):
    out = q_t_ngram_novelty(spark, sf_dir).toPandas()
    assert ((out["novelty"] >= 0) & (out["novelty"] <= 1)).all()
    assert (out["n_novel"] <= out["n_shingles"]).all()
    # the smallest doc_id owns every one of its shingles
    first = out.loc[out["doc_id"].idxmin()]
    assert first["n_novel"] == first["n_shingles"] and first["novelty"] == 1.0


def test_a22_hhi_bounds(spark, sf_dir):
    out = q_a22_hhi_concentration(spark, sf_dir).toPandas()
    assert ((out["hhi"] > 0) & (out["hhi"] <= 1.0 + 1e-12)).all()
    # HHI >= 1/n always
    assert (out["hhi"] >= 1.0 / out["n_customers"] - 1e-12).all()


def test_w28_rfm_scores_tile_correctly(spark, sf_dir):
    out = q_w28_rfm_segmentation(spark, sf_dir).toPandas()
    for c in ["r_score", "f_score", "m_score"]:
        assert out[c].between(1, 5).all()
    # within a nation, ntile sizes differ by at most 1
    for (_, grp) in out.groupby("n_name"):
        sizes = grp["r_score"].value_counts()
        assert sizes.max() - sizes.min() <= 1
    assert (
        out["segment"]
        == out["r_score"].astype(str) + out["f_score"].astype(str) + out["m_score"].astype(str)
    ).all()


def test_p_reservoir_exact_k_and_deterministic(spark, sf_dir):
    a = q_p_reservoir_sample(spark, sf_dir).toPandas()
    b = q_p_reservoir_sample(spark, sf_dir).toPandas()
    n_events = load_table(spark, sf_dir, "events").count()
    assert len(a) == min(1000, n_events)
    assert set(a["event_id"]) == set(b["event_id"])  # replayable


# ---------------------------------------------------------------------------
# ADVICE hardening
# ---------------------------------------------------------------------------


def test_bloom_prefilter_survives_column_name_collision(spark):
    """A fact table that already owns 'bloom_words' / '_bpos0' keeps its
    columns intact and still filters correctly (ADVICE r5 finding)."""
    from factory_inspectors_db_etl_spark.operators.bloom_join import (
        bloom_prefilter,
        build_bloom,
    )

    dim = spark.createDataFrame([(1,), (3,), (5,)], ["k"])
    fact = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40), (5, "e", 50)],
        ["k", "bloom_words", "_bpos0"],
    )
    bloom = build_bloom(dim, "k", num_bits=1 << 12, num_hashes=3)
    out = bloom_prefilter(fact, "k", bloom, num_bits=1 << 12, num_hashes=3)
    assert set(out.columns) == {"k", "bloom_words", "_bpos0"}
    rows = {r["k"]: (r["bloom_words"], r["_bpos0"]) for r in out.collect()}
    # no false negatives, user columns untouched
    assert {1, 3, 5} <= set(rows)
    assert rows[1] == ("a", 10) and rows[5] == ("e", 50)


def test_sqlite_rejects_suspicious_column_names(spark, tmp_path):
    from factory_inspectors_db_etl_spark.sources.sqlite_relational import write_relational

    df = spark.createDataFrame([(1, "x")], ["ok_col", 'bad"col'])
    with pytest.raises(ValueError, match="suspicious column"):
        write_relational(df, str(tmp_path / "t.db"), "t", key_cols=["ok_col"])
