"""Deep one-off fuzz of the algorithm-heavy operators, beyond the
hypothesis budget in tests/test_property_algorithms.py.

Usage: python scripts/fuzz_algorithms.py [n_iterations]
Exit 0 = every iteration agreed with the driver-side reference oracles.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.operators.dedup import (
    connected_components,
    connected_components_large_star,
)
from factory_inspectors_db_etl_spark.operators.dims import mint_surrogate_ids
from factory_inspectors_db_etl_spark.session import get_spark

def cc_reference(edges):
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


def run_fuzz(spark, n: int, seed: int = 20260814, verbose: bool = True) -> int:
    """Run ``n`` fuzz iterations; return the number of mismatches.

    Importable so the CI suite can run a small budget on every invocation
    (tests/test_fuzz_slow.py) while this script keeps the deep ad-hoc
    budget."""
    rng = random.Random(seed)
    bad = 0
    for it in range(n):
        n_nodes = rng.randint(2, 60)
        n_edges = rng.randint(1, 90)
        edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        want = cc_reference(edges)
        got_min = {
            r["node"]: r["component"]
            for r in connected_components(pairs, max_iters=80).collect()
        }
        got_ls = {
            r["node"]: r["component"]
            for r in connected_components_large_star(pairs, max_iters=40).collect()
        }
        if got_min != want or got_ls != want:
            bad += 1
            print(f"CC MISMATCH iter={it} edges={edges}")

        keys = [
            (
                rng.choice([None, "", "a", "b", "c", "zz", "aa"]),
                rng.choice([None, "0", "1", "2", "9"]),
            )
            for _ in range(rng.randint(1, 40))
        ]
        df = spark.createDataFrame(keys, "k1 string, k2 string").dropDuplicates(["k1", "k2"])
        w = Window.orderBy(F.col("k1").asc_nulls_first(), F.col("k2").asc_nulls_first())
        want_ids = {
            (r["k1"], r["k2"]): r["id"]
            for r in df.withColumn("id", F.row_number().over(w)).collect()
        }
        got_ids = {
            (r["k1"], r["k2"]): r["id"]
            for r in mint_surrogate_ids(df, ["k1", "k2"], "id").collect()
        }
        if got_ids != want_ids:
            bad += 1
            print(f"MINT MISMATCH iter={it} keys={sorted(set(keys))}")
        if verbose and (it + 1) % 10 == 0:
            print(f"{it + 1}/{n} iterations, {bad} mismatches", flush=True)
    return bad


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    spark = get_spark("fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    bad = run_fuzz(spark, n)
    print(f"done: {n} iterations, {bad} mismatches")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
