"""Property-based checks (hypothesis) for the algorithm-heavy operators.

Few examples, structurally diverse: each example is a full Spark
round-trip, so the value is in randomized SHAPE coverage (null patterns,
duplicate keys, graph topologies), not example count.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

# graphs: up to 24 nodes, arbitrary edge sets (self-loops allowed)
_edges = st.lists(
    st.tuples(st.integers(0, 23), st.integers(0, 23)),
    min_size=1,
    max_size=40,
)

# two-column natural keys with nulls and duplicates
_keys = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c", "d", ""])),
        st.one_of(st.none(), st.integers(0, 5).map(str)),
    ),
    min_size=1,
    max_size=30,
)

_prop = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _cc_reference(edges):
    """Driver-side union-find oracle."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


@given(edges=_edges)
@_prop
def test_both_cc_algorithms_match_union_find(spark, edges):
    from factory_inspectors_db_etl_spark.operators.dedup import (
        connected_components,
        connected_components_large_star,
    )

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    want = _cc_reference(edges)
    got_min = {r["node"]: r["component"] for r in connected_components(pairs, max_iters=30).collect()}
    got_ls = {
        r["node"]: r["component"]
        for r in connected_components_large_star(pairs, max_iters=30).collect()
    }
    assert got_min == want
    assert got_ls == want


@given(keys=_keys)
@_prop
def test_mint_ids_equal_global_row_number_random(spark, keys):
    from factory_inspectors_db_etl_spark.operators.dims import mint_surrogate_ids

    df = spark.createDataFrame(keys, "k1 string, k2 string").dropDuplicates(["k1", "k2"])
    w = Window.orderBy(F.col("k1").asc_nulls_first(), F.col("k2").asc_nulls_first())
    want = {
        (r["k1"], r["k2"]): r["id"]
        for r in df.withColumn("id", F.row_number().over(w)).collect()
    }
    got = {
        (r["k1"], r["k2"]): r["id"]
        for r in mint_surrogate_ids(df, ["k1", "k2"], "id").collect()
    }
    assert got == want
