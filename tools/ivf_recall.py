#!/usr/bin/env python3
"""Recall of the IVF-pruned operators against their exact twins
(dev tool for the SURVEY §6 production-geometry measurement).

Compares Verify dumps (outDir/<name>/):
  mm_pair_mining_ivf  vs mm_pair_mining   -> recall@3 per anchor
  vs_knn_ivf_batch    vs vs_knn_batch     -> recall@5 per query
                         (exact dump serves every vec_id; the IVF
                          batch serves vec_id % 50 == 0 — filter)

Usage: python3 tools/ivf_recall.py <exact_dump_dir> <ivf_dump_dir>
"""
import sys

import duckdb


def recall(exact_sel, ivf_sel):
    q = f"""
    WITH e AS ({exact_sel}), i AS ({ivf_sel})
    SELECT count(*) FILTER (WHERE i.id IS NOT NULL) * 1.0 / count(*),
           count(DISTINCT e.q)
    FROM e LEFT JOIN i USING (q, id)
    """
    r = duckdb.sql(q).fetchone()
    return r[0], r[1]


def main():
    exact, ivf = sys.argv[1], sys.argv[2]
    r3, n3 = recall(
        f"SELECT doc_id AS q, neg_id AS id FROM read_parquet('{exact}/mm_pair_mining/*.parquet')",
        f"SELECT doc_id AS q, neg_id AS id FROM read_parquet('{ivf}/mm_pair_mining_ivf/*.parquet')")
    print(f"mm_pair_mining_ivf recall@3 vs exact: {r3:.4f} over {n3} anchors")
    r5, n5 = recall(
        f"SELECT vec_id AS q, nid AS id FROM read_parquet('{exact}/vs_knn_batch/*.parquet') WHERE vec_id % 50 = 0",
        f"SELECT qid AS q, vec_id AS id FROM read_parquet('{ivf}/vs_knn_ivf_batch/*.parquet')")
    print(f"vs_knn_ivf_batch recall@5 vs exact: {r5:.4f} over {n5} queries")


if __name__ == "__main__":
    main()
