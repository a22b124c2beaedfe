"""catalog_ext9 operator properties (built r11, staged for the r12
driver window): independent brute-force twins, same discipline as
test_staged_ops / test_round9_ops.

* er_entity_clusters vs a Python union-find over brute-force blocked
  Levenshtein pairs — clustering, entity labeling, AND canonical choice
  checked against an algorithm that shares no code with the Spark plan.
* p_cluster_safe_split vs (a) the leakage-safety invariant itself
  (every near-dup cluster is split-atomic — the property the operator
  exists for) and (b) a hashlib re-derivation of the md5 bucket
  arithmetic, independent of both Spark and DuckDB.
"""

from __future__ import annotations

import hashlib
import itertools

from factory_inspectors_db_etl_spark.plans.catalog_ext9 import (
    _ER_MAX_DIST,
    q_er_entity_clusters,
    q_p_cluster_safe_split,
)
from factory_inspectors_db_etl_spark.sources.tables import load_table


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class _UF:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def test_er_entity_clusters_matches_union_find(spark, sf_dir):
    """Spark's blocked-fuzzy + min-label closure == Python union-find
    over brute-force pairs, on every row: same entity ids (min member
    key), same single canonical per entity."""
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand"
    ).collect()

    uf = _UF()
    for r in parts:
        uf.find(r["p_partkey"])
    # exact-name groups are trivially one entity
    by_name: dict[tuple, list[int]] = {}
    for r in parts:
        by_name.setdefault((r["p_brand"], r["p_name"]), []).append(r["p_partkey"])
    for keys in by_name.values():
        for k in keys[1:]:
            uf.union(keys[0], k)
    # fuzzy pairs under the same blocking policy, over DISTINCT names
    names = list(by_name)
    for (ba, na), (bb, nb) in itertools.combinations(names, 2):
        if ba == bb and len(na) == len(nb) and na != nb and _lev(na, nb) <= _ER_MAX_DIST:
            uf.union(by_name[(ba, na)][0], by_name[(bb, nb)][0])

    want = {k: uf.find(k) for r in parts for k in [r["p_partkey"]]}
    got = {
        r["p_partkey"]: (r["entity_id"], r["is_canonical"])
        for r in q_er_entity_clusters(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k, (ent, canon) in got.items():
        assert ent == want[k], f"part {k}: entity {ent} != union-find {want[k]}"
        assert canon == (k == ent)
    # exactly one canonical per entity, and some entity is non-trivial
    entities: dict[int, int] = {}
    for k, (ent, canon) in got.items():
        entities[ent] = entities.get(ent, 0) + int(canon)
    assert all(n == 1 for n in entities.values())
    assert any(sum(1 for v in got.values() if v[0] == e) > 1 for e in entities)


def _portable60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_cluster_safe_split_is_leakage_safe_and_hash_exact(spark, sf_dir):
    """(a) THE invariant: every near-dup component maps to exactly one
    split — no train/val straddle anywhere; (b) the split decision is
    exactly the md5 bucket arithmetic (re-derived with hashlib, no
    Spark/DuckDB involved); (c) both sides are non-empty at sf0.001, so
    the property is not vacuous."""
    rows = q_p_cluster_safe_split(spark, sf_dir).collect()
    comp_splits: dict[int, set] = {}
    for r in rows:
        comp_splits.setdefault(r["component_id"], set()).add(r["split"])
        want = (
            "train" if _portable60_py(str(r["component_id"])) % 10000 < 9000 else "val"
        )
        assert r["split"] == want
    assert all(len(s) == 1 for s in comp_splits.values())
    seen = {r["split"] for r in rows}
    assert seen == {"train", "val"}
    # split is doc-complete: one row per document
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
