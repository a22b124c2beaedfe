"""Generate a larger scale factor by key-shifted replication of an
existing driver-generated SF dir (TESTDATA.md tables).

Usage: python scripts/gen_sf.py SRC_DIR OUT_DIR N_REPLICAS

Each replica shifts every surrogate key by ``replica * (max_key + 1)``
consistently across fact/dim references (orders<->lineitem,
customer/part/supplier keys, events user/event ids, documents/embeddings
ids), so referential integrity and per-key row-group structure are
preserved at N× the rows.  region/nation stay as-is (bounded dims —
their keys are reused by every replica).  Text/embedding payloads are
replicated VERBATIM: cross-replica exact duplicates are a deliberate
worst case for the dedup/cluster family (10× cluster fan-in), which is
the point of a stress sweep.

This is NOT driver data — it exists to surface determinism/memory
knife-edges above sf0.1 (the r4 lesson: sim_pq_topk's grid-rounding bug
appeared only at sf0.1; the next one is waiting at sf1).  The DuckDB
oracle runs on the same generated parquet, so MATCH/MISMATCH grading is
exactly as meaningful as on driver data.
"""

from __future__ import annotations

import os
import sys

import duckdb

# key columns to shift per table: {table: {column: keyspace_table.column}}
# keyspace = which base table's max value defines the shift stride, so
# references shift identically on both sides.
SHIFTS: dict[str, dict[str, tuple[str, str]]] = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
COPY_ONLY = ["region", "nation"]


def generate(src: str, out: str, replicas: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    strides: dict[tuple[str, str], int] = {}
    for t, cols in SHIFTS.items():
        for _, ks in cols.items():
            if ks not in strides:
                (mx,) = con.execute(
                    f"SELECT max({ks[1]}) FROM read_parquet('{src}/{ks[0]}.parquet')"
                ).fetchone()
                strides[ks] = int(mx) + 1
    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, cols in SHIFTS.items():
        (allcols,) = [
            [r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()]
        ]
        selects = []
        for i in range(replicas):
            proj = ", ".join(
                f"{c} + {i * strides[cols[c]]} AS {c}" if c in cols else c
                for c in allcols
            )
            selects.append(f"SELECT {proj} FROM read_parquet('{src}/{t}.parquet')")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        (n,) = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()
        print(f"{t}: {n} rows ({replicas} replicas)")


if __name__ == "__main__":
    src, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    generate(src, out, n)
