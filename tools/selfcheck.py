#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]

Reads the parquet dumps produced by `graft.Verify` plus the
oracle_sql.json it wrote, runs each oracle SQL in DuckDB against views
named after the testdata tables, and compares row-by-row (columns
sorted by name, rows sorted, floats BIT-EXACT — the driver's gate
hashes full values, so a 1-ulp double difference must fail here too;
r3's vs_context_pack failure slipped through a 9-dp rounding this
mirror used to apply).

Dev tool only — the library itself has no Python dependency.
"""
import decimal
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Queries allowed to return 0 rows at a gate SF. Empty on purpose: a
# 0=0 comparison is vacuous (it cannot distinguish a broken filter or
# anti-join from a correct one — r6 shipped exactly that for
# q22_lost_customers at the 500-doc SF), so any query that CAN go
# empty must use thresholds relative to the data (SURVEY §5) or be
# explicitly listed here with a reason.
ALLOW_EMPTY: set = set()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly: any 1-ulp difference between
        # the Spark parquet and the DuckDB oracle shows up as a diff.
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # a DuckDB DECIMAL against a Spark double column: compare at
        # double precision (nearest double of the exact decimal).
        return repr(float(v))
    return v


def norm_rows(cols, rows):
    """Columns sorted by name; rows in INPUT order (Verify coalesces
    every dump to one file, so parquet read-back order is the query's
    declared order; the oracle SQL carries its own ORDER BY)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), out


def row_sorted(rows):
    return sorted(rows, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    # since r2 Verify binds oracle paths to its own sfDir, so this
    # replace is a no-op for matching runs; it remains only to retarget
    # an oracle dump produced at a DIFFERENT SF than the one checked.
    oracle = {k: v.replace("/root/testdata/sf0.01", sf_dir)
              for k, v in oracle.items()}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = out_dir / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            gcols, grows = norm_rows(got.columns, got.fetchall())
            want = con.sql(oracle[name])
            wcols, wrows = norm_rows(want.columns, want.fetchall())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if gcols != wcols:
            print(f"FAIL {name}: cols spark={gcols} oracle={wcols}")
            n_fail += 1
        elif not grows and not wrows and name not in ALLOW_EMPTY:
            print(f"FAIL {name}: vacuous 0=0 at this SF — the hash match "
                  "proves nothing; make the query's thresholds relative "
                  "or allowlist it with a reason")
            n_fail += 1
        elif len(grows) != len(wrows):
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(wrows)}")
            n_fail += 1
        elif grows == wrows:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
        elif row_sorted(grows) == row_sorted(wrows):
            # same multiset, different order: the query's ORDER BY is
            # not total (tie rows). Passes the driver's sorted hash but
            # is flagged so non-total orderings stay visible.
            print(f"PASS {name} ({len(grows)} rows; order differs — non-total ORDER BY)")
            n_pass += 1
        else:
            srows, wsrows = row_sorted(grows), row_sorted(wrows)
            bad = next(i for i, (a, b) in enumerate(zip(srows, wsrows)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  spark : {srows[bad]}")
            print(f"  oracle: {wsrows[bad]}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
