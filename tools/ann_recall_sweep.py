"""Recall-vs-cost sweep for the PCA→IVF→rerank ANN chain
(VERDICT r6 #7): measure pca_ivf_topk recall against the exact
brute-force top-k over a grid of (n_components, n_probe) at sf0.1, so
the production default is CHOSEN from a curve, not inherited.

Recall here = fraction of exact top-k (query, neighbor) pairs the
approximate index returns, over 64 query vectors (the gated entry
uses 5 — fine for a determinism pin, too coarse for a curve).

Usage: python tools/ann_recall_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analyst_spark.session import get_spark
from analyst_spark.tables import load_tables

K = 10
N_QUERIES = 64


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from analyst_spark.functions.similarity import cosine_topk, pca_ivf_topk

    spark = get_spark("ann_recall_sweep")
    emb = load_tables(spark, sf_dir)["embeddings"].persist()
    emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=K).collect()
    }
    print(f"{len(exact)} exact top-{K} pairs over {N_QUERIES} queries")
    print(f"{'comps':>5s} {'probe':>5s} {'recall':>7s} {'time':>7s}")
    for n_components in (4, 8, 16, 32):
        for n_probe in (2, 4, 6, 8, 12):
            best, approx = None, None
            for _ in range(2):
                t0 = time.time()
                got = {
                    (r.query_id, r.vec_id)
                    for r in pca_ivf_topk(
                        emb, queries, k=K,
                        n_components=n_components, n_probe=n_probe,
                    ).collect()
                }
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                approx = got
            rec = len(approx & exact) / len(exact)
            print(
                f"{n_components:5d} {n_probe:5d} {rec:7.3f} {best:6.2f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
