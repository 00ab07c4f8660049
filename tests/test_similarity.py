"""Similarity search: exact top-k correctness + LSH recall."""

import math
import random

from pyspark.sql import functions as F

from analyst_spark.functions.similarity import cosine_topk, lsh_bucket_topk


def _vectors(spark, n=100, dim=16, clusters=4, seed=7):
    rnd = random.Random(seed)
    centers = [
        [rnd.uniform(-1, 1) for _ in range(dim)] for _ in range(clusters)
    ]
    rows = []
    for i in range(n):
        c = centers[i % clusters]
        rows.append((i, [x + rnd.gauss(0, 0.05) for x in c]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_cosine_topk_matches_python(spark):
    df = _vectors(spark)
    vecs = {r.vec_id: r.embedding for r in df.collect()}
    out = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=5)
    got = [(r.vec_id, r.cosine_sim) for r in sorted(out.collect(), key=lambda r: r.rank)]
    expected = sorted(
        ((i, round(_cos(vecs[0], v), 6)) for i, v in vecs.items() if i != 0),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert got == expected


def test_cosine_topk_excludes_self_and_ranks(spark):
    df = _vectors(spark, n=30)
    out = cosine_topk(df, df.filter(F.col("vec_id") < 3), k=4).collect()
    assert len(out) == 12
    for r in out:
        assert r.vec_id != r.query_id
        assert 1 <= r.rank <= 4


def test_lsh_recall_on_clusters(spark):
    # Clustered data: same-cluster neighbors dominate; sign-LSH buckets
    # must recover most of the true top-k.
    df = _vectors(spark, n=200, dim=16)
    queries = df.filter(F.col("vec_id") < 8)
    exact = cosine_topk(df, queries, k=5).collect()
    approx = lsh_bucket_topk(df, queries, k=5, num_planes=4, dim=16).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_lsh_neardup_pairs_finds_planted_twins(spark):
    from analyst_spark.functions.similarity import lsh_neardup_pairs
    import pyspark.sql.functions as F

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    twins = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(3.0)).alias("embedding"),
    )
    out = lsh_neardup_pairs(base.unionByName(twins), 0.9, dim=64)
    rows = out.collect()
    n_twins = twins.count()
    # colinear twins share every sign bit -> recall exactly 1
    assert {(r.id_a, r.id_b) for r in rows} == {
        (r.vec_id - 10_000, r.vec_id) for r in twins.select("vec_id").collect()
    }
    assert all(r.cosine_sim == 1.0 for r in rows) and len(rows) == n_twins
    # the scale contract: no all-pairs join in the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_kmeans_train_converges_and_is_deterministic(spark):
    import math

    from analyst_spark.functions.similarity import kmeans_train

    emb = _vectors(spark, n=120, dim=16, clusters=8)
    n = 120

    def inertia(cents, assigned):
        joined = assigned.join(emb, "vec_id")
        rows = joined.collect()
        tot = 0.0
        for r in rows:
            c = cents[r.cluster]
            tot += sum((a - b) ** 2 for a, b in zip(r.embedding, c))
        return tot

    cents1, asg1 = kmeans_train(emb, k=8, iters=1)
    cents3, asg3 = kmeans_train(emb, k=8, iters=3)
    assert len(cents3) == 8 and all(len(c) == 16 for c in cents3)
    assert asg3.count() == n
    assert asg3.select("cluster").distinct().count() <= 8
    # Lloyd iterations never increase inertia
    i1, i3 = inertia(cents1, asg1), inertia(cents3, asg3)
    assert i3 <= i1 + 1e-6 and math.isfinite(i3)
    # deterministic: same input -> same assignment
    _, asg3b = kmeans_train(emb, k=8, iters=3)
    a = {r.vec_id: r.cluster for r in asg3.collect()}
    b = {r.vec_id: r.cluster for r in asg3b.collect()}
    assert a == b


def test_ivf_with_trained_centroids_recall(spark):
    """Composition check: kmeans_train centroids plugged into the IVF
    probe pattern recover most exact top-k neighbors on clustered
    data — the quality story behind the pluggable-centroid claim."""
    from analyst_spark.functions.similarity import cosine, kmeans_train
    from pyspark.sql import Window

    corpus = _vectors(spark, n=200, dim=16, clusters=8)
    queries = corpus.filter(F.col("vec_id") % 40 == 0)
    cents, assigned = kmeans_train(corpus, k=8, iters=2)
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], ["centroid_id", "__cent"]
    )
    # assign queries to their nearest 2 centroids, probe those lists
    qc = (
        queries.crossJoin(F.broadcast(cent_df))
        .withColumn("__csim", cosine(F.col("embedding"), F.col("__cent")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("__csim").desc())
            ),
        )
        .filter(F.col("rn") <= 2)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("__qv"), "centroid_id")
    )
    lists = assigned.join(corpus, "vec_id").select(
        "vec_id", F.col("embedding").alias("__cv"),
        F.col("cluster").alias("centroid_id"),
    )
    scored = (
        lists.join(F.broadcast(qc), "centroid_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("sim", cosine(F.col("__qv"), F.col("__cv")))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("vec_id").asc())
            ),
        )
        .filter(F.col("rank") <= 5)
    )
    approx = {(r.query_id, r.vec_id) for r in scored.collect()}
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, f"recall {recall}"


def test_ann_ivf_trained_entry_recall_and_determinism(spark):
    """The gated ann_ivf_trained entry (rows-only at the driver) is
    held to a recall bound against exact top-k here: probing 4 of 16
    trained lists must recover >= 60% of true neighbors on the real
    embeddings table, and the whole composition must be run-to-run
    deterministic (that is what the driver's rows+hash-stability
    check relies on)."""
    from analyst_spark.plans.text_plans import ann_cosine_topk, ann_ivf_trained

    sf_dir = "/root/testdata/sf0.001"
    approx = ann_ivf_trained(spark, sf_dir)
    exact = ann_cosine_topk(spark, sf_dir)
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    assert len(e) > 0
    assert len(a & e) / len(e) >= 0.6
    again = {(r.query_id, r.vec_id)
             for r in ann_ivf_trained(spark, sf_dir).collect()}
    assert again == a


def test_cosine_topk_guards_large_query_sets(spark):
    """The exact baseline fails fast instead of silently launching a
    |queries| x |corpus| scan; the error routes users to the bucketed
    variants, and max_queries=None is the explicit override."""
    import pytest

    from analyst_spark.functions.similarity import cosine_topk

    df = _vectors(spark, n=50, dim=8, clusters=4)
    with pytest.raises(ValueError, match="ann_lsh_topk/ann_ivf_topk"):
        cosine_topk(df, df, k=3, max_queries=10)
    # explicit opt-out still runs
    assert cosine_topk(df, df.limit(12), k=3, max_queries=None).count() > 0


def test_semantic_dedup_recovers_planted_twins(spark):
    """Scaled twins share direction with their source, so cluster
    assignment matches and within-cluster cosine is exactly 1.0 —
    every twin must flag with dup_of = source; nothing else flags."""
    import numpy as np
    from pyspark.sql import functions as F

    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.functions.similarity import semantic_dedup

    rng = np.random.RandomState(7)
    base = [(i, [float(x) for x in rng.randn(8)]) for i in range(40)]
    twins = [(100 + i, [2.0 * x for x in v]) for i, v in base if i % 10 == 0]
    df = spark.createDataFrame(base + twins, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, threshold=0.999, n_centroids=4)
    rows = {r.vec_id: r for r in out.collect()}
    release_cached(out)
    assert len(rows) == 44
    for i, _ in base:
        if i % 10 == 0:
            assert rows[100 + i].is_dup and rows[100 + i].dup_of == i
            assert rows[100 + i].cluster_id == rows[i].cluster_id
    assert sum(1 for r in rows.values() if r.is_dup) == len(twins)


def test_semantic_dedup_trained_recovers_twins_and_scales_k(spark):
    """The rows-only dedup_semantic_trained entry contract: planted
    x2-scaled twins resolve dup_of = their source, the composition is
    run-to-run deterministic, and the cluster count actually GROWS
    with the corpus (the scale-honesty fix — a constant k only
    divides the quadratic)."""
    from analyst_spark.functions.similarity import semantic_dedup_trained
    from analyst_spark.plans.text_plans import dedup_semantic_trained

    sf_dir = "/root/testdata/sf0.001"
    out = dedup_semantic_trained(spark, sf_dir)
    rows = out.collect()
    from analyst_spark.functions.dedup import release_cached
    release_cached(out)
    by_id = {r.vec_id: r for r in rows}
    # planted twins (vec_id = src + offset) must be flagged with
    # dup_of = src: colinear vectors have cosine exactly 1.0 and
    # identical centroid distances, so they share a cluster
    twins = [r for r in rows if r.vec_id >= 1_000_000]
    assert twins, "twin plants missing"
    recovered = [r for r in twins if r.is_dup and r.dup_of == r.vec_id - 1_000_000]
    assert len(recovered) / len(twins) >= 0.95
    # determinism (what rows-only gating leans on)
    out2 = dedup_semantic_trained(spark, sf_dir)
    again = {(r.vec_id, r.cluster_id, r.dup_of, r.is_dup) for r in out2.collect()}
    release_cached(out2)
    assert again == {(r.vec_id, r.cluster_id, r.dup_of, r.is_dup) for r in rows}
    # k grows with n: an 8x corpus must spread over more clusters
    # than a 1x one (64/8 clamps to the k=16 floor; 512/8 -> k=64)
    emb = spark.range(0, 512).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 8), j -> cast(hash(id, j) % 1000 as double) / 1000.0)"
        " AS embedding",
    )
    small = semantic_dedup_trained(emb.limit(64), target_cluster_size=8, iters=1)
    big = semantic_dedup_trained(emb, target_cluster_size=8, iters=1)
    k_small = small.select("cluster_id").distinct().count()
    k_big = big.select("cluster_id").distinct().count()
    release_cached(small)
    release_cached(big)
    assert k_small <= 16
    assert k_big > 16, f"k did not grow with n (distinct clusters {k_big})"


# ---------------- incremental embedding probe (r11)


def test_incremental_embedding_cross_only_and_plants(spark):
    """Cross probe: batch-vs-history pairs only (no intra-history,
    no intra-batch); colinear plants recovered at cosine 1.0."""
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.functions.similarity import (
        incremental_embedding_pairs,
    )

    hist = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0]),
         (3, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [(100, [2.0, 0.0, 0.0, 0.0]),   # colinear with 1 and 2
         (101, [0.0, 0.0, 5.0, 0.0]),   # orthogonal to everything
         (102, [0.0, 0.0, 5.0, 0.0])],  # dup of 101 WITHIN the batch
        "vec_id long, embedding array<double>",
    )
    out = incremental_embedding_pairs(hist, batch, 0.9, dim=4)
    got = {(r.id_batch, r.id_hist): r.cosine_sim for r in out.collect()}
    release_cached(out)
    assert got == {(100, 1): 1.0, (100, 2): 1.0}
    # (1,2) intra-history and (101,102) intra-batch must NOT appear


def test_incremental_embedding_catalog_plants(spark):
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.plans.catalog import QUERIES
    from analyst_spark.plans.text_plans import _IEMB_OFFSET, _TWIN_STEP
    from analyst_spark.tables import load_tables

    sf = "/root/testdata/sf0.001"
    out = QUERIES["dedup_incremental_embedding"](spark, sf)
    got = {(r.id_batch, r.id_hist): r.cosine_sim for r in out.collect()}
    release_cached(out)
    planted = [
        r.vec_id
        for r in load_tables(spark, sf)["embeddings"]
        .filter(
            (F.col("vec_id") % 4 != 0) & (F.col("vec_id") % _TWIN_STEP == 0)
        )
        .collect()
    ]
    assert planted
    for v in planted:
        assert got.get((v + _IEMB_OFFSET, v)) == 1.0, v


def test_ivf_append_equals_rebuild(spark):
    """r12 maintained-serving-index contract: because assignment
    depends only on the centroid table, appending a new batch's list
    rows to the history lists is ROW-IDENTICAL to rebuilding the
    lists over the union — and top-k from either frame matches."""
    from pyspark.sql import functions as F

    from analyst_spark.functions.similarity import (
        ivf_assign,
        ivf_topk_from_lists,
    )

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    hist = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    cents = (
        hist.orderBy("vec_id")
        .limit(4)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("__cent"),
        )
    )
    appended = ivf_assign(hist, cents).unionByName(ivf_assign(batch, cents))
    rebuilt = ivf_assign(emb, cents)
    key = lambda r: (r.vec_id, r.centroid_id)
    assert sorted(map(key, appended.collect())) == sorted(
        map(key, rebuilt.collect())
    )
    queries = emb.filter(F.col("vec_id") < 3)
    got_a = ivf_topk_from_lists(appended, queries, cents, k=5, n_probe=2)
    got_r = ivf_topk_from_lists(rebuilt, queries, cents, k=5, n_probe=2)
    tup = lambda r: (r.query_id, r.vec_id, r.rank, r.cosine_sim)
    assert sorted(map(tup, got_a.collect())) == sorted(
        map(tup, got_r.collect())
    )


def test_adaptive_probe_parity_and_depth(spark):
    """r13 confidence-scaled probing: (a) ivf_topk_from_lists with the
    true centroid-count cap reproduces ivf_topk exactly under the same
    probe_scale; (b) the adaptive rule strictly deepens probing for a
    low-confidence query (more candidate lists than the fixed cut) and
    never shrinks it; (c) probe_scale=None stays bit-identical to the
    pre-r13 fixed rule."""
    from pyspark.sql import functions as F

    from analyst_spark.functions.similarity import (
        ivf_assign,
        ivf_topk,
        ivf_topk_from_lists,
    )

    import random

    rng = random.Random(13)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 4)
    tup = lambda r: (r.query_id, r.vec_id, r.rank, r.cosine_sim)

    # (a) from_lists + explicit n_centroids cap == inline ivf_topk
    cents = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("__cent"),
        )
    )
    lists = ivf_assign(emb, cents)
    got_inline = ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=2, probe_scale=3.0
    )
    got_lists = ivf_topk_from_lists(
        lists, queries, cents, k=5, n_probe=2,
        probe_scale=3.0, n_centroids=8,
    )
    assert sorted(map(tup, got_inline.collect())) == sorted(
        map(tup, got_lists.collect())
    )

    # (b) adaptive result is a superset-or-equal candidate pool: its
    # per-query k-th cosine can only improve (random 8d vectors have
    # low best-centroid cosine, so the deep branch genuinely fires)
    fixed = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=2)
    kth = lambda df: {
        r.query_id: r.cosine_sim for r in df.collect() if r.rank == 5
    }
    kf, ka = kth(fixed), kth(got_inline)
    assert all(ka[q] >= kf[q] for q in kf)
    assert any(ka[q] > kf[q] for q in kf), (
        "deep-probe branch never fired — probe_scale test corpus "
        "routes too confidently"
    )

    # (c) default None keeps the fixed rule bit-identical
    none_path = ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=2, probe_scale=None
    )
    assert sorted(map(tup, none_path.collect())) == sorted(
        map(tup, fixed.collect())
    )


def test_needs_rebuild_thresholds(spark):
    """r13 drift-trigger pins (thresholds from tools/ivf_drift_probe.py,
    SCALE.md "r13: IVF serving-index drift"): the no-drift control's
    worst measured ratio (0.953) must NOT trigger; the shift regime's
    0.75x-appended ratio (0.833) MUST; parity appends and a dead
    baseline always trigger."""
    from analyst_spark.functions.similarity import needs_rebuild

    q0 = 0.2643  # trained_quality measured on the sf0.1 corpus
    assert not needs_rebuild(q0, q0 * 0.953, 0.5)   # control, step 3
    assert needs_rebuild(q0, q0 * 0.833, 0.75)      # shift, step 3
    assert needs_rebuild(q0, q0 * 0.99, 1.0)        # parity ceiling
    assert needs_rebuild(0.0, 0.2, 0.1)             # dead baseline


def test_assignment_quality_matches_mean_cosine(spark):
    """assignment_quality == the plain mean of round(cos(v, cent), 6)
    over the inverted lists (the statistic needs_rebuild consumes)."""
    from pyspark.sql import functions as F

    from analyst_spark.functions.similarity import (
        assignment_quality,
        ivf_assign,
    )

    import math
    import random

    rng = random.Random(99)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = (
        emb.orderBy("vec_id")
        .limit(4)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("__cent"),
        )
    )
    lists = ivf_assign(emb, cents)
    got = assignment_quality(lists, cents)
    cvecs = {r["centroid_id"]: r["__cent"] for r in cents.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    expect = [
        round(cos(r["__cv"], cvecs[r["centroid_id"]]), 6)
        for r in lists.collect()
    ]
    assert abs(got - sum(expect) / len(expect)) < 1e-9
