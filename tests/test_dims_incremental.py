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
