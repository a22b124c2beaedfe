"""Analytics pack over the warehouse (A2/A3/W7/O5 + date extension) and
the parquet round-trip (S4/S5): one warehouse build shared module-wide.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.plans import inspectors_analytics as A
from factory_inspectors_db_etl_spark.plans.inspectors_etl import build_warehouse, write_warehouse

CORPUS = "/root/reference/diplom"


@pytest.fixture(scope="module")
def warehouse(spark):
    t = build_warehouse(spark, f"{CORPUS}/fabric*.html")
    t["assignments"] = t["assignments"].cache()
    return t


def test_regional_rollup_grand_total(warehouse):
    roll = A.regional_rollup(warehouse["assignments"])
    grand = roll.filter(
        "year IS NULL AND okrug_name IS NULL AND gubernia_name IS NULL"
    ).collect()
    assert len(grand) == 1
    assert grand[0]["n_assignments"] == 4127
    # rollup grand total equals a direct aggregate
    direct = warehouse["assignments"].agg(F.sum("worker_count")).collect()[0][0]
    assert grand[0]["workers"] == direct


def test_career_trajectories_lag_semantics(warehouse):
    traj = A.career_trajectories(warehouse["assignments"])
    # first observation per inspector has no predecessor
    firsts = traj.filter("prev_year IS NULL").groupBy("inspector_id").count()
    per_inspector = traj.groupBy("inspector_id").count()
    assert firsts.count() == per_inspector.count()
    # a known multi-year career exists (some inspector spans years)
    assert traj.filter("moved_gubernia").count() > 0
    assert traj.filter("prev_year IS NOT NULL AND year < prev_year").count() == 0


def test_career_summary_span(warehouse):
    s = A.career_summary(warehouse["assignments"])
    r = s.agg(F.max("span_years"), F.max("n_gubernias")).collect()[0]
    assert r[0] >= 10  # someone served across the full 1901-1913 range
    assert r[1] >= 2
    assert s.filter("first_year > last_year").count() == 0


def test_education_distribution(warehouse):
    dist = A.education_distribution(warehouse["assignments"], warehouse["educations"])
    assert dist.count() > 0
    assert dist.filter("n_inspectors <= 0").count() == 0


def test_tenure_dates_typed(warehouse):
    d = A.tenure_dates(warehouse["assignments"])
    typed = d.filter("start_date IS NOT NULL")
    assert typed.count() > 0
    # the typed date carries the fact year and a valid month
    bad = typed.filter("year(start_date) != year").count()
    assert bad == 0
    # raw phrase "с 10 дек" style: day matches
    sample = typed.filter("start_date_raw LIKE '%10 дек%'").select("start_date").first()
    if sample:
        assert sample[0].day == 10 and sample[0].month == 12


def test_top_mobile_inspectors(warehouse):
    top = A.top_mobile_inspectors(warehouse["assignments"], k=5).collect()
    assert len(top) == 5
    assert all(
        top[i]["n_gubernias"] >= top[i + 1]["n_gubernias"] for i in range(len(top) - 1)
    )


def test_warehouse_roundtrip_partition_pruning(spark, warehouse, tmp_path):
    out = str(tmp_path / "wh")
    write_warehouse(warehouse, out)
    fact = spark.read.parquet(f"{out}/assignments")
    assert fact.count() == 4127
    # year partition actually prunes: only one partition directory scanned
    pruned = fact.filter("year = 1905")
    assert pruned.count() == 351
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(year" in plan or "year#" in plan
