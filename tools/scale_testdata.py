#!/usr/bin/env python3
"""Scale-up generator for BENCH ONLY (dev tool, not library code).

Builds an N-times-larger copy of a driver-generated sf directory by
unioning N key-shifted copies of every fact/corpus table (dims region
and nation stay 1x, as in TPC-H). Key shifts are consistent across
tables (lineitem.l_orderkey tracks orders.o_orderkey etc.), so every
join keeps its selectivity; text/embedding payloads are repeated
verbatim, which models web-scale duplication (dedup operators see
10-member duplicate families — bounded, so pair joins stay linear).

Implemented with pyarrow, NOT an SQL engine: the output must carry
the driver's parquet schemas BIT-FOR-BIT. The first (DuckDB) version
of this tool silently rewrote events.ts timestamp[ns] -> [us], which
flips Spark's read type from LongType (nanosAsLong) to TimestampType
and broke every events-time query at sf1 while all of them pass at
driver SFs. Key shifts are pure int64 adds, so pyarrow preserves
everything else by construction.

Usage: python3 tools/scale_testdata.py [src] [dst] [copies] [--roll]
Default: /root/testdata/sf0.1 -> /tmp/graft_sf1 x10 (~sf1).

--roll (bounded-family mode): cyclically roll each embedding copy by
its copy index (copy j's vectors are the originals' dims rotated j
positions). Rolling is norm-preserving and decorrelates copies (a
rolled near-uniform vector is ~orthogonal to its original), so the
verbatim tiling's C-squared duplicate families vanish: this is the
corpus shape AFTER exact dedup — every embedding is distinct content —
at the FULL scaled N. (Literally running dedup_exact on the verbatim
tiling would collapse N back to 1x, which is why the scale witness
needs this mode instead.) Same-copy pairs keep the source corpus's
exact geometry, so the 1x close-tail structure replicates linearly.

Since r14, --roll also perturbs documents.text per copy (VERDICT r13
item 2): every whitespace token of copy j>0 gets a per-copy suffix
("~sj"), so no word shingle survives across copies and the minhash /
shingle pair term becomes linear in copies — the TEXT twin of the
embedding roll, with the same rationale (a verbatim tiling's dup
families grow as C^2, so any pair producer's ANSWER is quadratic and
the witness measures the answer term, not the plan). Within a copy
every doc gets the same suffix, so the 1x near-dup structure
replicates exactly. The suffix survives graft's tokenizer (lowercase
whitespace split, no punctuation stripping).

Correctness inputs remain the driver's parquet — this output is only
for the one-off scaling measurement recorded in SURVEY §6.
"""
import re
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# compiled once at module scope (ADVICE r14: recompiling inside the
# per-table per-batch column loop was avoidably slow at large copies)
_SALT_SUB = re.compile(r"\S+").sub

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
    args = [a for a in sys.argv[1:] if a != "--roll"]
    roll = "--roll" in sys.argv[1:]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    dst = Path(args[1] if len(args) > 1 else "/tmp/graft_sf1")
    copies = int(args[2]) if len(args) > 2 else 10
    dst.mkdir(parents=True, exist_ok=True)

    strides = {}
    for fam, cols in FAMILIES.items():
        t, c = cols[0]
        col = pq.read_table(f"{src}/{t}.parquet", columns=[c])[c]
        strides[fam] = pc.max(col).as_py() + 1

    shift = {}  # (table, col) -> stride
    for fam, cols in FAMILIES.items():
        for t, c in cols:
            shift[(t, c)] = strides[fam]

    for t in DIMS:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl, dst / f"{t}.parquet")
        print(f"{t}: copied 1x")

    for t in SCALED:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        # one row group per shifted copy, streamed through a single
        # writer so the 10x lineitem never sits in memory twice
        writer = pq.ParquetWriter(dst / f"{t}.parquet", tbl.schema)
        n = 0
        for i in range(copies):
            cols = []
            for name in tbl.schema.names:
                col = tbl[name]
                if (t, name) in shift and i > 0:
                    col = pc.add(col, i * shift[(t, name)])
                    # pc.add may widen/nullify-change nothing for int64,
                    # but cast back defensively to pin the field type
                    col = col.cast(tbl.schema.field(name).type)
                elif roll and t == "embeddings" and name == "embedding" and i > 0:
                    import numpy as np
                    field_t = tbl.schema.field(name).type
                    mat = np.stack(col.combine_chunks().to_numpy(
                        zero_copy_only=False))
                    mat = np.roll(mat, i % mat.shape[1], axis=1)
                    col = pa.array(list(mat), type=field_t)
                elif roll and t == "documents" and name == "text" and i > 0:
                    # per-copy token salt on EVERY \S+ token (text has
                    # newlines; a space-only split would leave interior
                    # tokens unsalted and let some shingles collide
                    # cross-copy), whitespace preserved
                    field_t = tbl.schema.field(name).type
                    rep = f"\\g<0>~s{i}"
                    col = pa.array(
                        [None if v is None else _SALT_SUB(rep, v)
                         for v in col.combine_chunks().to_pylist()],
                        type=field_t)
                cols.append(col)
            out = pa.Table.from_arrays(cols, schema=tbl.schema)
            writer.write_table(out)
            n += out.num_rows
        writer.close()
        got = pq.read_schema(dst / f"{t}.parquet")
        assert got.equals(pq.read_schema(f"{src}/{t}.parquet"),
                          check_metadata=False), f"schema drift in {t}"
        print(f"{t}: {n} rows ({copies}x)")


if __name__ == "__main__":
    main()
