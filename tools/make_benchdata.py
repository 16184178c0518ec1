"""Materialize larger bench scale-factors by key-shifted replication
of the driver's read-only sf0.1 tables (TESTDATA.md says do NOT
regenerate the driver data — so scale-ups live in repo-local
benchdata/, gitignored).

Scaling rules (replica i of K):
- fact/dim keys shift by i * stride (stride = max base key + 1), so
  every FK relationship is preserved replica-locally and join/group
  cardinalities scale linearly like a real larger SF;
- region/nation stay fixed (they are fixed-size dims at every TPC-H
  SF);
- timestamps are kept, so time-window densities grow ×K (exactly what
  a larger SF does over the same calendar range);
- documents: replica 0 keeps the original text; replicas i>0 suffix
  every token with `_r{i}` — kills cross-replica shingle overlap so
  dedup workloads scale like a genuinely larger corpus (replicating
  text verbatim would instead synthesize K-way duplicate groups and
  quadratic candidate blow-up the real corpus doesn't have), while
  within-replica duplicate structure is preserved verbatim;
- embeddings: ids shift, vectors repeat (ANN cost is driven by row
  count × dim, not vector values).

Usage: python tools/make_benchdata.py [K] [out_dir] [src_dir]
Defaults: K=10 (sf0.1 → sf1), out=<repo>/benchdata/sf1.
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KEYED = {
    # table -> {column: key_family}; families shift together
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "benchdata", "sf1")
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    strides: dict[str, int] = {}
    for table, cols in KEYED.items():
        for col, fam in cols.items():
            m = con.execute(
                f"SELECT MAX({col}) FROM '{src}/{table}.parquet'"
            ).fetchone()[0]
            strides[fam] = max(strides.get(fam, 0), int(m) + 1)

    for table in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{table}.parquet') TO "
            f"'{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied")

    for table, cols in KEYED.items():
        base_cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(k):
            exprs = []
            for c in base_cols:
                if c in cols:
                    exprs.append(f"{c} + {i * strides[cols[c]]} AS {c}")
                elif table == "documents" and c == "text" and i > 0:
                    exprs.append(
                        "array_to_string(list_transform("
                        f"regexp_split_to_array(text, '\\s+'), x -> x || '_r{i}'"
                        f"), ' ') AS text"
                    )
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{src}/{table}.parquet'"
            )
        union = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
