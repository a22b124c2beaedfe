"""Incremental dimension maintenance (J2 incremental variant): existing
ids stable, unseen keys appended after max(id)."""

from __future__ import annotations

from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.operators.dims import build_dim, build_dim_incremental
from factory_inspectors_db_etl_spark.sources.tables import load_table


def test_incremental_appends_only_unseen(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    first = p.filter("p_partkey % 2 = 0")
    second = p  # includes everything

    dim1 = build_dim(first, ["p_type"], "type_id")
    dim2 = build_dim_incremental(dim1, second, ["p_type"], "type_id")

    # old ids unchanged
    old = {r["p_type"]: r["type_id"] for r in dim1.collect()}
    new = {r["p_type"]: r["type_id"] for r in dim2.collect()}
    assert all(new[k] == v for k, v in old.items())
    # full coverage, unique contiguous ids
    n_types = p.select("p_type").distinct().count()
    assert len(new) == n_types
    assert sorted(new.values()) == list(range(1, n_types + 1))
    # ids of novel keys all come after the old max
    novel = set(new) - set(old)
    if novel:
        assert min(new[k] for k in novel) == max(old.values()) + 1


def test_incremental_noop_when_no_new_keys(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    dim1 = build_dim(p, ["p_type"], "type_id")
    dim2 = build_dim_incremental(dim1, p, ["p_type"], "type_id")
    assert sorted(map(tuple, dim1.collect())) == sorted(map(tuple, dim2.collect()))


# ---------------------------------------------------------------------------
# two-phase surrogate minting (mint_surrogate_ids)
# ---------------------------------------------------------------------------


def test_mint_ids_equal_global_row_number(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from factory_inspectors_db_etl_spark.operators.dims import mint_surrogate_ids

    rows = [
        (None, None), (None, "x"), ("a", None), ("a", "p"), ("a", "q"),
        ("b", "p"), ("c", None), ("c", "z"),
    ]
    df = spark.createDataFrame(rows, "k1 string, k2 string")
    want_w = Window.orderBy(
        F.col("k1").asc_nulls_first(), F.col("k2").asc_nulls_first()
    )
    want = {
        (r["k1"], r["k2"]): r["id"]
        for r in df.withColumn("id", F.row_number().over(want_w)).collect()
    }
    got = {
        (r["k1"], r["k2"]): r["id"]
        for r in mint_surrogate_ids(df, ["k1", "k2"], "id").collect()
    }
    assert got == want


def test_mint_ids_with_order_preserving_bucket(spark):
    from pyspark.sql import functions as F

    from factory_inspectors_db_etl_spark.operators.dims import mint_surrogate_ids

    names = [(w,) for w in ["anna", "abel", "bo", "", "carl", "beth", "ava"]]
    df = spark.createDataFrame(names, "name string")
    got = mint_surrogate_ids(
        df, ["name"], "id", bucket=F.substring(F.col("name"), 1, 1)
    )
    ordered = [r["name"] for r in got.orderBy("id").collect()]
    assert ordered == sorted(w for (w,) in names)


def test_mint_ids_plan_has_no_unpartitioned_window(spark):
    """Regression pin for the r2 perf-weak finding: no WindowExec without
    partition expressions anywhere in the minting plan (the global-window
    form funnels the whole dim through one task at scale)."""
    from factory_inspectors_db_etl_spark.operators.dims import mint_surrogate_ids
    from factory_inspectors_db_etl_spark.sources.tables import load_table
    import os

    p = load_table(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"), "part")
    minted = mint_surrogate_ids(p.select("p_type").distinct(), ["p_type"], "type_id")
    plan = minted._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            # partition expressions precede the first ORDER spec inside
            # windowspecdefinition(...); an unpartitioned window starts
            # its spec directly with an ordering expression
            spec = line.split("windowspecdefinition(", 1)[1]
            assert not spec.lstrip().startswith(("ASC", "DESC")), line
            first_arg = spec.split(",", 1)[0]
            assert "ASC" not in first_arg and "DESC" not in first_arg, line
