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


# ---------------------------------------------------------------------------
# FIFO allocation (round 6): distributed cumulative-interval form vs the
# sequential two-pointer walk, over randomized demand/supply shapes
# ---------------------------------------------------------------------------

_streams = st.tuples(
    st.lists(st.integers(1, 200), min_size=0, max_size=14),  # demand qtys
    st.lists(st.integers(1, 200), min_size=0, max_size=14),  # supply qtys
)


def _fifo_reference(demand, supply):
    out, di, si = {}, 0, 0
    d, s = [[i, q] for i, q in enumerate(demand)], [[j, q] for j, q in enumerate(supply)]
    while di < len(d) and si < len(s):
        take = min(d[di][1], s[si][1])
        out[(d[di][0], s[si][0])] = take
        d[di][1] -= take
        s[si][1] -= take
        if d[di][1] == 0:
            di += 1
        if s[si][1] == 0:
            si += 1
    return out


@_prop
@given(_streams)
def test_fifo_allocate_matches_sequential_walk_randomized(spark, streams):
    from factory_inspectors_db_etl_spark.operators.allocation import fifo_allocate

    demand, supply = streams
    if not demand or not supply:
        return  # empty side: nothing to allocate (schema inference needs rows)
    ddf = spark.createDataFrame([("k", i, q) for i, q in enumerate(demand)], ["key", "seq", "qty"])
    sdf = spark.createDataFrame([("k", j, q) for j, q in enumerate(supply)], ["key", "seq", "qty"])
    # small cell width forces multi-cell intervals and boundary pairs
    out = fifo_allocate(ddf, sdf, ["key"], ["seq"], "qty", cell_width=16).toPandas()
    got = {(r.d_seq, r.s_seq): r.alloc_qty for r in out.itertuples()}
    assert got == _fifo_reference(demand, supply)
    assert sum(got.values()) == min(sum(demand), sum(supply))
