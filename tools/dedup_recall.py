#!/usr/bin/env python3
"""Recall of a blocked embedding-dedup dump against the exact pair set
(dev tool for the SURVEY §6 production-geometry measurement).

Recomputes the exact dist<=radius pair set directly from the corpus
parquet (numpy, chunked — no engine in the loop), then scores a
Verify dump of dedup_embedding_ivf (or dedup_embedding_lsh) against
it, decomposed into the near-dup band (dist <= 0.05 — the pairs
dedup exists to remove) and the mid-sim tail. Soundness (dump is a
subset of the exact set) is asserted, not just reported.

Usage: python3 tools/dedup_recall.py <sf_dir> <dump_dir>/<query_name>
       [radius=0.55]
"""
import glob
import sys

import numpy as np
import pyarrow.parquet as pq


def main():
    sf_dir, dump = sys.argv[1], sys.argv[2]
    radius = float(sys.argv[3]) if len(sys.argv) > 3 else 0.55

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist())
    # float64 throughout, and the engine's rounding mirrored exactly
    # (SafeRound: round(x + 1e-9, 4), HALF_UP after the nudge): a
    # float32 matmul + bare np.round (half-to-even) can flip pairs
    # whose distance sits on a 4-decimal boundary or within float32
    # error of the radius, spuriously failing the soundness assert.
    v = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, v = ids[order], v[order]
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)

    exact = {}
    chunk = 2000
    for i0 in range(0, len(vn), chunk):
        d = np.round(1 - vn[i0:i0 + chunk] @ vn.T + 1e-9, 4)
        for r, c in zip(*np.where(d <= radius)):
            a, b = int(ids[i0 + r]), int(ids[c])
            if a < b:
                exact[(a, b)] = float(d[r, c])

    got = set()
    for f in glob.glob(f"{dump}/*.parquet"):
        tt = pq.read_table(f, columns=["vec_a", "vec_b"])
        got.update(zip(tt["vec_a"].to_pylist(), tt["vec_b"].to_pylist()))

    assert got.issubset(exact.keys()), \
        f"UNSOUND: dump has {len(got - exact.keys())} pairs outside the exact set"
    near = {k for k, d in exact.items() if d <= 0.05}
    mid = exact.keys() - near

    def rec(s):
        return len(s & got) / len(s) if s else float("nan")
    print(f"exact pairs: {len(exact)}  dump pairs: {len(got)}  sound: yes")
    print(f"overall recall: {rec(exact.keys()):.4f}")
    print(f"near-dup (dist<=0.05): {len(near)} pairs, recall {rec(near):.4f}")
    print(f"mid-sim  (dist>0.05):  {len(mid)} pairs, recall {rec(mid):.4f}")


if __name__ == "__main__":
    main()
