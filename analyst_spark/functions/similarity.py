"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force cosine top-k of a (small) query set
  against the corpus. The query side is broadcast, so the corpus is
  scanned once with no shuffle; per-row work is a 64-wide fused
  HigherOrderFunction (zip_with + aggregate) in the JVM — no Python.
  This is the exact baseline ANN evaluators compare against.
* ``lsh_bucket_topk`` — random-hyperplane (sign-LSH) bucketed
  variant: corpus and queries hash to sign-bit buckets; only matching
  buckets are compared. The scale path: at 100 TB the bucket join
  replaces the full scan per query batch.

All arithmetic in double precision, sequential over the vector — so
an oracle engine computing the same dot product sequentially matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from analyst_spark.tables import spread


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (query_id, vec_id, rank, cosine_sim), self-matches
    excluded, ties broken by corpus id ascending (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = spread(corpus, id_col).select(F.col(id_col), F.col(vec_col).alias("__cv"))
    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), round_digits)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "cosine_sim")
    )


def hyperplane_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = (vec · plane_i) >= 0.

    Plane literals are built as one F.expr string per plane (a single
    py4j call) — building 64 F.lit columns per plane costs ~2s of
    driver time per query otherwise."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.expr("array(" + ",".join(f"{float(x)}D" for x in plane) + ")")
        d = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d >= 0, F.lit(2 ** i).cast("long")).otherwise(0)
    return bucket


def _pseudo_planes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG dependency):
    a simple LCG keyed by (plane, coord), values in [-1, 1)."""
    planes = []
    state = 88172645463325252
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            # xorshift64
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            row.append((state % 2_000_001) / 1_000_000.0 - 1.0)
        planes.append(row)
    return planes


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: corpus vectors are assigned to their nearest
    centroid (inverted lists); each query probes only its ``n_probe``
    nearest lists instead of the full corpus.

    Centroids here are the ``n_centroids`` lowest-id corpus vectors —
    deterministic, so the whole plan is SQL-expressible and
    hash-checkable. Centroid *selection* is orthogonal to the plan
    shape: at scale swap in k-means(||) centroids; assignment, probe,
    and rescore stay identical. Similarities are rounded to 6dp BEFORE
    ranking on both engines so float noise can't flip list order.

    At 100 TB the assignment is one broadcast pass over the corpus and
    candidate scoring touches ~n_probe/n_centroids of the data — the
    full-scan-per-query cost model brute force can't escape.
    """
    cents = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__cent"))
    )
    sim_to_cent = F.round(cosine(F.col("__v"), F.col("__cent")), 6)

    def nearest(df: DataFrame, n: int, keep_vec: bool) -> DataFrame:
        ranked = (
            df.crossJoin(F.broadcast(cents))
            .withColumn("__csim", sim_to_cent)
            .withColumn(
                "__crn",
                F.row_number().over(
                    Window.partitionBy("__id").orderBy(
                        F.col("__csim").desc(), F.col("centroid_id").asc()
                    )
                ),
            )
            .filter(F.col("__crn") <= n)
        )
        cols = ["__id", "centroid_id"] + (["__v"] if keep_vec else [])
        return ranked.select(*cols)

    c = spread(corpus, id_col).select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    )
    q = queries.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    inv_lists = nearest(c, 1, keep_vec=True).select(
        F.col("__id").alias(id_col), "centroid_id", F.col("__v").alias("__cv")
    )
    probes = nearest(q, n_probe, keep_vec=True).select(
        F.col("__id").alias("query_id"), "centroid_id", F.col("__v").alias("__qv")
    )
    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), 6)
    scored = (
        inv_lists.join(F.broadcast(probes), ["centroid_id"])
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "cosine_sim")
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's sign-LSH
    bucket (2^num_planes buckets). Recall < 1 by design; the 100 TB
    path where a full scan per query is unaffordable."""
    planes = _pseudo_planes(num_planes, dim)
    cb = spread(corpus, id_col).withColumn("__bucket", hyperplane_bits(F.col(vec_col), planes))
    qb = queries.withColumn("__bucket", hyperplane_bits(F.col(vec_col), planes))
    q = qb.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"), "__bucket"
    )
    c = cb.select(F.col(id_col), F.col(vec_col).alias("__cv"), "__bucket")
    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), 6)
    scored = (
        c.join(F.broadcast(q), ["__bucket"])
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "cosine_sim")
    )


def lsh_neardup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 16,
    bits_per_band: int = 8,
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold) without an
    all-pairs join: sign-LSH banding for candidate generation, exact
    cosine verify within candidates only.

    Each vector gets ``bands`` bucket ids (one per band of
    ``bits_per_band`` sign bits); two vectors become a candidate pair
    iff they share a bucket in at least one band. The self-join keys
    on (band, bucket), so the pair space is sum-of-squares of bucket
    sizes — ~n/2^bits_per_band expected collisions per vector for
    unclustered data, never O(n²). Exact cosine then filters
    candidates, so precision is 1.0; recall is the banding OR:
    P(found) = 1-(1-p^r)^b with p = 1-angle/pi. Colinear duplicates
    (cosine 1.0) have identical sign bits and are found with
    probability exactly 1.

    At 100 TB: two shuffles (bucket join, verify join-back on id);
    hot buckets are AQE skew-split; raise bits_per_band to thin
    buckets before raising bands.

    Output: (id_a, id_b, cosine_sim), id_a < id_b.
    """
    v = spread(df, id_col).select(F.col(id_col), F.col(vec_col).alias("__v"))
    planes = _pseudo_planes(bands * bits_per_band, dim)
    band_structs = []
    for b in range(bands):
        bits = hyperplane_bits(
            F.col("__v"), planes[b * bits_per_band : (b + 1) * bits_per_band]
        )
        band_structs.append(
            F.struct(F.lit(b).alias("band"), bits.alias("bucket"))
        )
    buckets = v.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")
    a, b_ = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    ea = v.select(F.col(id_col).alias("id_a"), F.col("__v").alias("__va"))
    eb = v.select(F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"))
    sim = F.round(cosine(F.col("__va"), F.col("__vb")), round_digits)
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )
