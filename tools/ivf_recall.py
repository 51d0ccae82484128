#!/usr/bin/env python3
"""Recall of the IVF-pruned operators against their exact twins
(dev tool for the SURVEY §6 production-geometry measurement).

Compares Verify dumps (outDir/<name>/):
  mm_pair_mining_ivf  vs mm_pair_mining   -> recall@3 per anchor
  vs_knn_ivf_batch    vs vs_knn_batch     -> recall@5 per query
                         (exact dump serves every vec_id; the IVF
                          batch serves vec_id % 50 == 0 — filter)

Usage: python3 tools/ivf_recall.py <exact_dump_dir> <ivf_dump_dir> [sf_dir]

With sf_dir given, additionally reports the RELAXED mining contract
(SURVEY §6 conclusion 3): at scale, any near-top wrong-source negative
serves as a hard negative — a mined negative counts as a hit when it
sits within the anchor's TRUE top-m (m=10) wrong-source neighbors,
not only its exact top-3. This is the metric that justifies the
default (scan-bounded) probe depth: strict top-3 recall decays with
depth while the relaxed contract holds.
"""
import sys

import duckdb


def _cos(a, b):
    dot = (f"list_sum([{a}[i]::DOUBLE * {b}[i]::DOUBLE "
           f"for i in generate_series(1, len({a}))])")
    n = lambda v: (f"sqrt(list_sum([{v}[i]::DOUBLE * {v}[i]::DOUBLE "
                   f"for i in generate_series(1, len({v}))]))")
    return f"(1 - {dot} / ({n(a)} * {n(b)}))"


def relaxed_hardness(ivf_dump, sf_dir, m=10):
    """Fraction of mined negatives inside the true top-m wrong-source
    neighbor set of their anchor (exact scoring over the corpus)."""
    q = f"""
    WITH mined AS (
      SELECT doc_id AS q, neg_id AS id
      FROM read_parquet('{ivf_dump}/mm_pair_mining_ivf/*.parquet')),
    e AS (SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')),
    src AS (SELECT doc_id, source FROM read_parquet('{sf_dir}/documents.parquet')),
    anchors AS (SELECT DISTINCT q FROM mined),
    truth AS (
      SELECT q, id FROM (
        SELECT a.q, e2.vec_id AS id,
          row_number() OVER (PARTITION BY a.q
            ORDER BY {_cos('e1.embedding', 'e2.embedding')}, e2.vec_id) AS r
        FROM anchors a
        JOIN e e1 ON e1.vec_id = a.q
        JOIN src s1 ON s1.doc_id = a.q
        CROSS JOIN e e2
        JOIN src s2 ON s2.doc_id = e2.vec_id
        WHERE e2.vec_id <> a.q AND s2.source <> s1.source)
      WHERE r <= {m})
    SELECT count(*) FILTER (WHERE t.id IS NOT NULL) * 1.0 / count(*),
           count(*)
    FROM mined LEFT JOIN truth t USING (q, id)
    """
    r = duckdb.sql(q).fetchone()
    return r[0], r[1]


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
    if len(sys.argv) > 3:
        h, nm = relaxed_hardness(ivf, sys.argv[3])
        if nm == 0:
            print("mm_pair_mining_ivf relaxed hardness: EMPTY mining dump "
                  "(0 mined negatives) — nothing to score")
        else:
            print(f"mm_pair_mining_ivf relaxed hardness (mined ∈ true top-10 "
                  f"wrong-source): {h:.4f} over {nm} mined negatives")


if __name__ == "__main__":
    main()
