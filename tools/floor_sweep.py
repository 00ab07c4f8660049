"""Multi-variant sweep behind the measured-quality gate floors
(VERDICT r11 #8).

The r11 gates held floors well below their measured values
(ann_pca_ivf 0.60 vs 0.72, ann_ivf_trained 0.75 vs 0.84, classifier
0.70 vs 0.78-0.81) — slack wide enough for a real regression to hide
inside. The entries are deterministic functions of the corpus, so
"seeds" here are CORPUS/QUERY variants:

* ANN recall@10 — five DISJOINT 5-query sets (vec_id in
  [5v, 5v+5)) per scale factor, each measured against the exact
  numpy top-10 (cosine rounded to 6, desc, vec_id asc, self
  excluded — the oracle's exact tie rules).
* classifier accuracy — five disjoint corpus slices
  (doc_id % 5 == v) per scale factor, IRLS trained and evaluated
  per slice against the Gopher weak labels.

Floors are then set at (measured minimum − margin); the sweep table
lives in SCALE.md "r12: floor sweep".

Usage: python tools/floor_sweep.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from analyst_spark.session import get_spark
from analyst_spark.tables import load_tables

N_VARIANTS = 5
QUERIES_PER_SET = 5
K = 10


def _exact_topk(X: np.ndarray, vec_ids: np.ndarray, qids: list[int]):
    """Exact top-K neighbor set per query id, under the catalog's tie
    rules (cosine rounded to 6 desc, vec_id asc, self excluded)."""
    norms = np.linalg.norm(X, axis=1)
    out = {}
    id_to_row = {int(v): i for i, v in enumerate(vec_ids)}
    for q in qids:
        qi = id_to_row[q]
        sims = np.round(X @ X[qi] / (norms * norms[qi]), 6)
        order = sorted(
            (i for i in range(len(X)) if i != qi),
            key=lambda i: (-sims[i], vec_ids[i]),
        )
        out[q] = {int(vec_ids[i]) for i in order[:K]}
    return out


def sweep_ann(spark, sf_dir: str):
    from analyst_spark.functions.similarity import (
        ivf_topk,
        kmeans_train,
        pca_ivf_topk,
    )

    emb = load_tables(spark, sf_dir)["embeddings"]
    rows = (
        emb.select("vec_id", F.col("embedding").cast("array<double>"))
        .orderBy("vec_id")
        .collect()
    )
    vec_ids = np.array([r[0] for r in rows])
    X = np.stack([np.array(r[1]) for r in rows])
    cents, _ = kmeans_train(emb, k=16, iters=2)
    results = {"ann_pca_ivf": [], "ann_ivf_trained": []}
    for v in range(N_VARIANTS):
        qids = [
            int(q)
            for q in vec_ids[
                (vec_ids >= v * QUERIES_PER_SET)
                & (vec_ids < (v + 1) * QUERIES_PER_SET)
            ]
        ]
        exact = _exact_topk(X, vec_ids, qids)
        queries = emb.filter(
            (F.col("vec_id") >= v * QUERIES_PER_SET)
            & (F.col("vec_id") < (v + 1) * QUERIES_PER_SET)
        )
        # configs MIRROR the catalog entries (r13: confidence-scaled
        # probing, probe_scale=3.0 — text_plans._IVF_PROBE_SCALE)
        for name, df in (
            (
                "ann_pca_ivf",
                pca_ivf_topk(
                    emb, queries, k=K, n_components=16, n_probe=8,
                    probe_scale=3.0,
                ),
            ),
            (
                "ann_ivf_trained",
                ivf_topk(
                    emb, queries, k=K, n_probe=4, centroids=cents,
                    probe_scale=3.0,
                ),
            ),
        ):
            got: dict[int, set] = {}
            for r in df.collect():
                got.setdefault(r.query_id, set()).add(r.vec_id)
            recalls = [
                len(got.get(q, set()) & exact[q]) / K for q in qids
            ]
            rec = sum(recalls) / len(recalls)
            results[name].append(round(rec, 4))
            print(f"  {name} variant {v} (queries {qids[0]}..{qids[-1]}): "
                  f"recall@10 = {rec:.4f}", flush=True)
    return results


def sweep_classifier(spark, sf_dir: str):
    from analyst_spark.functions.classifier import (
        dense_quality_stats,
        score_quality_dense,
        train_quality_irls,
    )
    from analyst_spark.plans.pipeline_plans import gopher_features

    docs_all = load_tables(spark, sf_dir)["documents"]
    accs = []
    for v in range(N_VARIANTS):
        docs = docs_all.filter(F.col("doc_id") % N_VARIANTS == v)
        labels = gopher_features(docs).select(
            "doc_id", F.col("keep").cast("double").alias("y")
        )
        stats = dense_quality_stats(docs).persist()
        w, b = train_quality_irls(stats, labels)
        scored = score_quality_dense(stats, w, b).join(labels, "doc_id")
        agg = scored.select(
            (
                ((F.col("score") >= 0.5) == (F.col("y") >= 0.5)).cast("int")
            ).alias("ok")
        ).agg(F.avg("ok").alias("acc"), F.count(F.lit(1)).alias("n")).first()
        stats.unpersist()
        accs.append(round(float(agg.acc), 4))
        print(f"  classifier slice doc_id%5=={v}: accuracy = "
              f"{agg.acc:.4f} over {agg.n} docs", flush=True)
    return {"docs_quality_classifier": accs}


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("floor_sweep")
    summary: dict[str, list[float]] = {}
    for d in sf_dirs:
        print(f"== {d}", flush=True)
        for part in (sweep_ann(spark, d), sweep_classifier(spark, d)):
            for k_, vals in part.items():
                summary.setdefault(k_, []).extend(vals)
    print("\n== summary (all variants x scale factors)")
    for k_, vals in summary.items():
        print(
            f"{k_}: min={min(vals):.4f} max={max(vals):.4f} "
            f"values={vals}",
            flush=True,
        )


if __name__ == "__main__":
    main()
