"""Distributed PCA twin tests: the Spark treeAggregate-shaped
pca_train must agree with a direct numpy PCA on the same data, and
the embeddings_pca entry must be deterministic (what rows-only gating
leans on)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _toy(spark, n=240, dim=12, seed=7):
    rng = np.random.RandomState(seed)
    # anisotropic data: variance concentrated in the first 3 axes
    scales = np.array([10.0, 5.0, 2.0] + [0.1] * (dim - 3))
    mat = rng.randn(n, dim) * scales + 3.0
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    return mat, spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_pca_train_matches_numpy(spark):
    from analyst_spark.functions.similarity import pca_train

    mat, df = _toy(spark)
    mean, comps, expl = pca_train(df, n_components=4)
    # numpy twin: same covariance convention (biased, /n)
    np_mean = mat.mean(axis=0)
    cov = (mat - np_mean).T @ (mat - np_mean) / mat.shape[0]
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1][:4]
    assert np.allclose(mean, np_mean, atol=1e-9)
    assert np.allclose(expl, eigval[order], rtol=1e-9)
    for k, i in enumerate(order):
        v = eigvec[:, i]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        assert np.allclose(comps[k], v, atol=1e-8), f"component {k}"
    # variance ordering is descending and dominated by the 3 big axes
    assert expl[0] >= expl[1] >= expl[2] >= expl[3]
    assert sum(expl[:3]) / np.trace(cov) > 0.95


def test_pca_project_reconstruction_and_determinism(spark):
    from analyst_spark.functions.similarity import pca_project, pca_train

    mat, df = _toy(spark)
    mean, comps, _ = pca_train(df, n_components=3)
    proj = {
        r.vec_id: np.array(r.projection)
        for r in pca_project(df, mean, comps).collect()
    }
    # twin projection (same rounding)
    W = np.array(comps)  # (k, dim)
    for i in range(0, 240, 37):
        want = np.round(W @ (mat[i] - np.array(mean)), 6)
        assert np.allclose(proj[i], want, atol=1e-6), i
    # rank-3 reconstruction captures >95% of the energy
    errs, tots = 0.0, 0.0
    for i in range(240):
        centered = mat[i] - np.array(mean)
        rec = W.T @ (W @ centered)
        errs += float(((centered - rec) ** 2).sum())
        tots += float((centered ** 2).sum())
    assert errs / tots < 0.05
    # determinism: identical model + projections on a re-run
    mean2, comps2, _ = pca_train(df, n_components=3)
    assert mean2 == mean and comps2 == comps


def test_embeddings_pca_entry(spark):
    from analyst_spark.plans.text_plans import _PCA_COMPONENTS, embeddings_pca

    out = embeddings_pca(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 500
    assert all(len(r.projection) == _PCA_COMPONENTS for r in rows)
    again = embeddings_pca(spark, "/root/testdata/sf0.001").collect()
    assert {r.vec_id: tuple(r.projection) for r in rows} == {
        r.vec_id: tuple(r.projection) for r in again
    }


def test_ann_pca_ivf_recall_and_determinism(spark):
    """The PCA→IVF→rerank chain must recover most exact neighbors on
    the real embeddings (low-d routing loses little — the r7 sweep
    showed 4d routes as well as 32d here) and be run-to-run
    deterministic."""
    from analyst_spark.plans.text_plans import ann_cosine_topk, ann_pca_ivf

    sf_dir = "/root/testdata/sf0.001"
    approx = ann_pca_ivf(spark, sf_dir)
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    e = {(r.query_id, r.vec_id)
         for r in ann_cosine_topk(spark, sf_dir).collect()}
    assert len(e) > 0
    assert len(a & e) / len(e) >= 0.6, f"recall {len(a & e) / len(e):.2f}"
    again = {(r.query_id, r.vec_id)
             for r in ann_pca_ivf(spark, sf_dir).collect()}
    assert again == a
