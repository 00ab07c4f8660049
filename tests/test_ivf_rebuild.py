"""End-to-end IVF rebuild lifecycle (VERDICT r13 #4).

`needs_rebuild` was a pinned pure function; nothing executed the
rebuild-and-swap a serving system performs when it fires. This module
drives the full cycle on a deterministic drift scenario:

  train → append drifted batch against frozen centroids → the
  quality-ratio trigger fires → `ivf_rebuild` retrains FROM THE
  MAINTAINED LISTS (no corpus rescan) → post-rebuild assignment
  quality is back at baseline and the adaptive routing depth (the
  cost statistic drift actually degrades, per the r13 drift probe)
  drops back from probe-everything to shallow.

Scenario: 8 tight clusters on orthogonal axes e_0..e_7 of R^16
(ids interleaved so lowest-id k-means init covers every cluster);
the appended batch sits on e_8 — orthogonal to everything trained,
the worst-case drift direction.
"""

import pytest
from pyspark.sql import functions as F

from analyst_spark.functions.similarity import (
    assignment_quality,
    ivf_assign,
    ivf_rebuild,
    ivf_topk_from_lists,
    kmeans_train,
    needs_rebuild,
    routing_depth,
)

DIM = 16
K = 8
N_PER = 10  # per trained cluster
N_BATCH = 40  # 0.5x the trained mass: only the RATIO path may fire


def _vec(axis: int, i: int):
    # unit-ish vector on e_axis with small deterministic off-axis
    # jitter (different per point, never flipping the dominant axis)
    v = [0.0] * DIM
    v[axis] = 1.0
    v[(axis + 1 + i % 5) % DIM] += ((i * 31 + axis * 17) % 7 - 3) / 50.0
    return v


def _base_rows():
    # id i belongs to cluster i % K -> the K lowest ids cover all
    # clusters (kmeans_train inits from lowest ids)
    return [(i, _vec(i % K, i)) for i in range(K * N_PER)]


def _batch_rows():
    return [(1000 + i, _vec(8, i)) for i in range(N_BATCH)]


@pytest.fixture(scope="module")
def lifecycle(spark):
    emb = spark.createDataFrame(
        _base_rows(), "vec_id long, embedding array<double>"
    )
    cent_rows, _ = kmeans_train(emb, k=K, iters=3)
    cents0 = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cent_rows)],
        "centroid_id long, __cent array<double>",
    )
    lists0 = ivf_assign(emb, cents0).persist()
    lists0.count()
    q0 = assignment_quality(lists0, cents0)

    batch = spark.createDataFrame(
        _batch_rows(), "vec_id long, embedding array<double>"
    )
    batch_lists = ivf_assign(batch, cents0)
    qb = assignment_quality(batch_lists, cents0)
    combined = lists0.unionByName(batch_lists).persist()
    combined.count()
    return {
        "spark": spark,
        "emb": emb,
        "batch": batch,
        "cents0": cents0,
        "q0": q0,
        "qb": qb,
        "combined": combined,
    }


def test_trigger_fires_on_drifted_batch(lifecycle):
    q0, qb = lifecycle["q0"], lifecycle["qb"]
    assert q0 > 0.9  # trained baseline is tight
    # the e_8 batch is orthogonal to every trained centroid
    assert qb / q0 < 0.85
    assert needs_rebuild(q0, qb, appended_fraction=0.5)
    # control: a same-distribution batch does NOT fire
    assert not needs_rebuild(q0, q0 * 0.99, appended_fraction=0.5)


def test_rebuild_restores_quality_and_equals_from_scratch(lifecycle):
    spark = lifecycle["spark"]
    combined = lifecycle["combined"]
    cents1, lists1, q1 = ivf_rebuild(combined, k=K, iters=3)
    lists1 = lists1.persist()

    # (a) quality restored: the previously-drifted batch assigns at
    # >= 0.95 of the NEW trained baseline
    qb1 = assignment_quality(
        lists1.filter(F.col("vec_id") >= 1000), cents1
    )
    assert q1 > 0.9
    assert qb1 / q1 >= 0.95

    # (b) the rebuild consumed ONLY maintained state, yet is
    # row-identical to an index built from scratch on the raw corpus
    corpus = lifecycle["emb"].unionByName(lifecycle["batch"])
    cent_rows, _ = kmeans_train(corpus, k=K, iters=3)
    cents_scratch = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cent_rows)],
        "centroid_id long, __cent array<double>",
    )
    lists_scratch = ivf_assign(corpus, cents_scratch)
    assert sorted(map(tuple, cents1.collect())) == sorted(
        map(tuple, cents_scratch.collect())
    )
    got = sorted((r.vec_id, r.centroid_id) for r in lists1.collect())
    want = sorted((r.vec_id, r.centroid_id) for r in lists_scratch.collect())
    assert got == want

    # (c) serving works against the swapped-in index: drifted queries
    # find their true (same-cluster) neighbors
    queries = lifecycle["batch"].limit(5)
    topk = ivf_topk_from_lists(
        lists1, queries, cents1, k=5, n_probe=2,
        probe_scale=3.0, n_centroids=K,
    )
    rows = topk.collect()
    assert len(rows) == 25
    assert all(r.vec_id >= 1000 for r in rows)  # neighbors are batch-mates

    # (d) routing COST is back at baseline: before the rebuild the
    # adaptive rule probed every list for drifted queries (bm ~ 0);
    # after, routing confidence is restored and the depth is shallow
    depth_before = routing_depth(
        queries, lifecycle["cents0"], n_probe=2,
        probe_scale=3.0, n_centroids=K,
    )
    depth_after = routing_depth(
        queries, cents1, n_probe=2, probe_scale=3.0, n_centroids=K
    )
    assert depth_before == K  # degenerated to probe-everything
    assert depth_after <= 4.2  # ceil(3.0/best_cos) at cos ~ 1
    lists1.unpersist()
