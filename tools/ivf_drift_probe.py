"""IVF serving-index drift probe (VERDICT r12 #6).

``ann_ivf_incremental`` appends new vectors against FROZEN centroids;
recall decays as the appended mass drifts from the trained
distribution, and nothing measured when. This probe:

* trains k-means centroids on the sf0.1 embedding corpus (the
  catalog's trained-IVF configuration: k=16, iters=2);
* appends batches up to 2× the trained corpus in two regimes —
  ``none`` (append vectors drawn from the trained distribution:
  jittered copies) and ``shift`` (progressive mean shift: batch b
  adds b·δ along a fixed off-distribution direction);
* per append step measures, over 25 queries drawn from the NEWEST
  batch: recall@10 of the frozen-centroid index
  (ivf_topk_from_lists, the serving entry's machinery, adaptive
  probing as shipped) vs the exact numpy top-10 over the combined
  corpus, the same recall for a REBUILT index (centroids retrained on
  the combined corpus — the alternative the trigger buys), and the
  batch assignment-quality ratio (mean assignment cosine of the
  batch / the trained baseline) that ``needs_rebuild`` monitors.

The output table is the basis for the thresholds documented at
``functions/similarity.py:needs_rebuild``.

Usage: python tools/ivf_drift_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from analyst_spark.session import get_spark
from analyst_spark.tables import load_tables

K = 10
N_QUERIES = 25
STEPS = 8           # append steps of base/4 rows each -> 2x at the end
DELTA = 0.35        # per-step mean shift along the drift direction


def exact_topk(X, ids, qrows):
    norms = np.linalg.norm(X, axis=1)
    out = {}
    for qi in qrows:
        s = np.round(X @ X[qi] / (norms * norms[qi] + 1e-300), 6)
        order = sorted(
            (i for i in range(len(X)) if i != qi),
            key=lambda i: (-s[i], ids[i]),
        )
        out[int(ids[qi])] = {int(ids[i]) for i in order[:K]}
    return out


def spark_df(spark, X, ids):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, X)],
        "vec_id long, embedding array<double>",
    )


def cents_df(spark, C):
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(C)],
        "centroid_id long, __cent array<double>",
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ivf_drift_probe")
    from analyst_spark.functions.similarity import (
        assignment_quality,
        ivf_assign,
        ivf_topk_from_lists,
        kmeans_train,
    )
    from analyst_spark.plans.text_plans import (
        _IVF_CENTROIDS,
        _IVF_PROBE,
        _IVF_PROBE_SCALE,
    )

    emb = load_tables(spark, sf)["embeddings"]
    rows = (
        emb.filter(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .orderBy("vec_id")
        .collect()
    )
    base_ids = np.array([r[0] for r in rows])
    X0 = np.stack([np.array(r[1]) for r in rows])
    n0, dim = X0.shape
    rng = np.random.RandomState(1313)
    drift_dir = rng.randn(dim)
    drift_dir /= np.linalg.norm(drift_dir)

    cents0, _ = kmeans_train(emb, k=_IVF_CENTROIDS, iters=2)
    c0 = cents_df(spark, cents0)
    lists0 = ivf_assign(spark_df(spark, X0, base_ids), c0).persist()
    lists0.count()
    q0 = assignment_quality(lists0, c0)
    print(f"base n={n0} dim={dim} trained_quality={q0:.4f}", flush=True)
    print("regime step appended_frac | frozen_recall rebuilt_recall "
          "| batch_quality ratio", flush=True)

    for regime in ("none", "shift"):
        X = X0.copy()
        ids = base_ids.copy()
        lists = lists0
        step_rows = n0 // 4
        for step in range(1, STEPS + 1):
            src = rng.randint(0, n0, size=step_rows)
            batch = X0[src] + 0.05 * rng.randn(step_rows, dim)
            if regime == "shift":
                batch = batch + (DELTA * step) * drift_dir
            bids = np.arange(len(ids), len(ids) + step_rows) + 1_000_000
            X = np.vstack([X, batch])
            ids = np.concatenate([ids, bids])
            bdf = spark_df(spark, batch, bids)
            blists = ivf_assign(bdf, c0)
            lists = lists.unionByName(blists)
            bq = assignment_quality(blists, c0)

            qsel = rng.choice(
                np.arange(len(X) - step_rows, len(X)), N_QUERIES,
                replace=False,
            )
            truth = exact_topk(X, ids, qsel)
            queries = spark_df(spark, X[qsel], ids[qsel])
            got = ivf_topk_from_lists(
                lists, queries, c0, k=K, n_probe=_IVF_PROBE,
                probe_scale=_IVF_PROBE_SCALE, n_centroids=_IVF_CENTROIDS,
            )
            by_q: dict[int, set] = {}
            for r in got.collect():
                by_q.setdefault(r.query_id, set()).add(r.vec_id)
            frozen = np.mean(
                [len(by_q.get(q, set()) & t) / K for q, t in truth.items()]
            )
            # rebuilt reference: retrain on the combined corpus
            comb = spark_df(spark, X, ids)
            cents_r, _ = kmeans_train(comb, k=_IVF_CENTROIDS, iters=2)
            cr = cents_df(spark, cents_r)
            lists_r = ivf_assign(comb, cr)
            got_r = ivf_topk_from_lists(
                lists_r, queries, cr, k=K, n_probe=_IVF_PROBE,
                probe_scale=_IVF_PROBE_SCALE, n_centroids=_IVF_CENTROIDS,
            )
            by_qr: dict[int, set] = {}
            for r in got_r.collect():
                by_qr.setdefault(r.query_id, set()).add(r.vec_id)
            rebuilt = np.mean(
                [len(by_qr.get(q, set()) & t) / K for q, t in truth.items()]
            )
            frac = (len(X) - n0) / n0
            print(
                f"{regime:5s} {step:4d} {frac:13.2f} | "
                f"{frozen:13.2f} {rebuilt:14.2f} | "
                f"{bq:13.4f} {bq / q0:5.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
