#!/usr/bin/env python3
"""Scale-up generator for BENCH ONLY (dev tool, not library code).

Builds an N-times-larger copy of a driver-generated sf directory by
unioning N key-shifted copies of every fact/corpus table (dims region
and nation stay 1x, as in TPC-H). Key shifts are consistent across
tables (lineitem.l_orderkey tracks orders.o_orderkey etc.), so every
join keeps its selectivity; text/embedding payloads are repeated
verbatim, which models web-scale duplication (dedup operators see
10-member duplicate families — bounded, so pair joins stay linear).

Usage: python3 tools/scale_testdata.py [src] [dst] [copies]
Default: /root/testdata/sf0.1 -> /tmp/graft_sf1 x10 (~sf1).

Correctness inputs remain the driver's parquet — this output is only
for the one-off scaling measurement recorded in SURVEY §6.
"""
import sys
from pathlib import Path

import duckdb

# table -> columns to shift, grouped by key family (same family =
# same stride, so cross-table joins stay consistent)
FAMILIES = {
    "cust": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "supp": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "ord": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "ev": [("events", "event_id")],
    "user": [("events", "user_id")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
}
SCALED = ["customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]
DIMS = ["region", "nation"]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1")
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    strides = {}
    for fam, cols in FAMILIES.items():
        t, c = cols[0]
        strides[fam] = con.sql(
            f"SELECT max({c}) + 1 FROM '{src}/{t}.parquet'").fetchone()[0]

    shift = {}  # (table, col) -> stride
    for fam, cols in FAMILIES.items():
        for t, c in cols:
            shift[(t, c)] = strides[fam]

    for t in DIMS:
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied 1x")

    for t in SCALED:
        cols = [r[0] for r in
                con.sql(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + i * {shift[(t, c)]} AS {c}" if (t, c) in shift else c
            for c in cols)
        con.sql(f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
                f"range({copies}) r(i)) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({copies}x)")


if __name__ == "__main__":
    main()
