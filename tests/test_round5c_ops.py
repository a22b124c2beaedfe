"""Unit/property tests for the round-5 third batch (catalog_ext3):
bidirectional nearest-event join, count-min sketch, rolling median,
FK audit, snapshot diff, weighted sampling, seasonal baseline.

Cross-engine value equality is covered by tests/test_catalog_vs_duckdb.py
(all seven are registered catalog queries); this file pins the properties
the oracles cannot express — agreement with an independent brute-force /
pandas recompute, the CMS one-sided-error guarantee on adversarial data,
and the snapshot-diff round-trip (applying the changelog to the old
snapshot reproduces the new one exactly).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.plans.catalog_ext3 import (
    _WS_DEN,
    _WS_SALT,
    q_a15_countmin,
    q_a16_seasonal_baseline,
    q_j15_nearest_event_join,
    q_j17_snapshot_diff,
    q_p_fk_audit,
    q_p_weighted_sample,
    q_w19_rolling_median,
)
from factory_inspectors_db_etl_spark.sources.tables import load_table


def _events_pdf(spark, sf_dir) -> pd.DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("v_cents"),
    )
    return ev.toPandas()


def test_nearest_event_join_matches_bruteforce(spark, sf_dir):
    """Per purchase, scan ALL same-user clicks in Python and pick the
    minimal |gap| with the prefer-preceding tie rule — must equal the
    two-window-pass plan exactly (ids, gaps, and directions)."""
    pdf = _events_pdf(spark, sf_dir)
    got = {
        r["purchase_id"]: (r["click_id"], r["gap_us"], r["direction"])
        for r in q_j15_nearest_event_join(spark, sf_dir).collect()
    }
    purchases = pdf[pdf.event_type == "purchase"]
    clicks = pdf[pdf.event_type == "click"]
    assert len(got) == len(purchases) > 0
    n_after = 0
    for _, p in purchases.iterrows():
        cl = clicks[clicks.user_id == p.user_id]
        if cl.empty:
            assert got[p.event_id] == (None, None, None)
            continue
        # prev = max (ts,id) among clicks ordered before/equal the purchase
        # in the (ts_us, event_id) total order; next = min strictly after
        key = (p.ts_us, p.event_id)
        before = cl[[tuple(x) < key for x in zip(cl.ts_us, cl.event_id)]]
        after = cl[[tuple(x) > key for x in zip(cl.ts_us, cl.event_id)]]
        prev = before.sort_values(["ts_us", "event_id"]).iloc[-1] if len(before) else None
        nxt = after.sort_values(["ts_us", "event_id"]).iloc[0] if len(after) else None
        gp = p.ts_us - prev.ts_us if prev is not None else None
        gn = nxt.ts_us - p.ts_us if nxt is not None else None
        if prev is not None and (nxt is None or gp <= gn):
            want = (prev.event_id, gp, "before")
        else:
            want = (nxt.event_id, gn, "after")
            n_after += 1
        assert got[p.event_id] == want, p.event_id
    assert n_after > 0  # the bidirectional case actually exercises "after"


def test_rolling_median_matches_pandas(spark, sf_dir):
    pdf = _events_pdf(spark, sf_dir).sort_values(["user_id", "ts_us", "event_id"])
    pdf["want"] = (
        pdf.groupby("user_id")["v_cents"]
        .transform(lambda s: s.rolling(7, min_periods=1).median())
        / 100.0
    )
    got = {
        r["event_id"]: (r["rolling_median"], r["n_in_frame"])
        for r in q_w19_rolling_median(spark, sf_dir).collect()
    }
    assert len(got) == len(pdf)
    for _, row in pdf.iterrows():
        med, n = got[row.event_id]
        assert med == pytest.approx(row.want, abs=0)
        assert n <= 7


def test_countmin_one_sided_error_and_exact_replay(spark, sf_dir):
    rows = q_a15_countmin(spark, sf_dir).collect()
    assert rows
    total = sum(r["true_count"] for r in rows)
    for r in rows:
        assert r["never_undercounts"] is True
        assert r["cms_estimate"] >= r["true_count"]
        # d=4, w=256: the min-over-rows estimate can't exceed truth + N
        # (trivial bound); on this data it should be far tighter
        assert r["overcount"] <= total
    # python replay of the sketch for one user must agree
    pdf = _events_pdf(spark, sf_dir)
    counts = pdf.user_id.value_counts()
    uid = int(counts.index[0])

    def bucket(row: int, u: int) -> int:
        h = int(hashlib.md5(f"cms{row}:{u}".encode()).hexdigest()[:15], 16)
        return h % 256

    cells = {}
    for u, c in counts.items():
        for r in range(4):
            k = (r, bucket(r, int(u)))
            cells[k] = cells.get(k, 0) + int(c)
    want = min(cells[(r, bucket(r, uid))] for r in range(4))
    got = {r["user_id"]: r["cms_estimate"] for r in rows}[uid]
    assert got == want


def test_snapshot_diff_roundtrip(spark, sf_dir):
    """Applying the emitted changelog to the old snapshot must reproduce
    the new snapshot exactly — the defining property of a diff."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    old = {
        r["o_orderkey"]: r["cents"]
        for r in orders.filter(F.col("o_orderkey") % 7 != 3).collect()
    }
    new = {
        r["o_orderkey"]: (r["cents"] + 100 if r["o_orderkey"] % 3 == 0 else r["cents"])
        for r in orders.filter(F.col("o_orderkey") % 5 != 2).collect()
    }
    state = dict(old)
    n_classes = {"insert": 0, "update": 0, "delete": 0}
    for r in q_j17_snapshot_diff(spark, sf_dir).collect():
        k, ct = r["o_orderkey"], r["change_type"]
        n_classes[ct] += 1
        if ct == "delete":
            assert state.pop(k) == round(r["old_price"] * 100)
        else:
            if ct == "update":
                assert k in state
            else:
                assert k not in state
            state[k] = round(r["new_price"] * 100)
    assert state == new
    assert all(v > 0 for v in n_classes.values()), n_classes


def test_weighted_sample_is_the_deterministic_hash_set(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    want = {}
    for r in docs.collect():
        h = int(
            hashlib.md5((_WS_SALT + r["text"]).encode()).hexdigest()[:15], 16
        ) % _WS_DEN
        w = min(r["n_chars"], _WS_DEN)
        if h < w:
            want[r["doc_id"]] = _WS_DEN / w
    got = {
        r["doc_id"]: r["inv_prob"] for r in q_p_weighted_sample(spark, sf_dir).collect()
    }
    assert got == want and got


def test_seasonal_baseline_flag_is_exact(spark, sf_dir):
    rows = q_a16_seasonal_baseline(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    sums = defaultdict(lambda: [0, 0])
    for r in rows:
        cell = sums[(r["event_type"], r["hod"])]
        cell[0] += round(r["value_usd"] * 100)
        cell[1] += 1
    n_anom = 0
    for r in rows:
        s, n = sums[(r["event_type"], r["hod"])]
        want = round(r["value_usd"] * 100) * n > 2 * s
        assert r["is_anomaly"] == want
        n_anom += want
    assert 0 < n_anom < len(rows)


def test_fk_audit_reports_intact_schema_and_counts(spark, sf_dir):
    rows = {r["relation"]: r for r in q_p_fk_audit(spark, sf_dir).collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert r["orphan_keys"] == 0 and r["intact"] is True
        assert 0 < r["child_keys"] <= r["child_rows"]
    li = load_table(spark, sf_dir, "lineitem").count()
    assert rows["lineitem.orderkey->orders"]["child_rows"] == li
