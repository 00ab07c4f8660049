"""Three-decade scaling evidence: build 10x-sf0.1 tables by perturbed
replication of the driver's sf0.1 data and time each operator family
on sf0.01 / sf0.1 / sf0.1x10.

Replication detail (realistic, not degenerate growth):

* documents — copy k of doc d gets doc_id = d + k*OFFSET and a
  distinct "copyk" prefix token, so exact-dedup fingerprints differ
  and shingle sets shift;
* embeddings — copy k of vector v gets vec_id = v + k*OFFSET and a
  deterministic per-coordinate perturbation (hash-derived, ±0.5%), so
  near-dup/ANN structure grows without colliding with the planted
  x2-twin device the gated entries use;
* events — copy k shifts event_id and user_id, modelling growth by
  MORE USERS (per-user series length constant — how event volume
  actually grows), so sessionize/funnel state stays bounded per key.

The derived tables live under /tmp and are measurement artifacts only
— correctness gates always run on the driver's own parquet.

Usage: python tools/scale_stress.py [--family documents|embeddings|events|all] [entry ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyst_spark.functions.dedup import release_cached
from analyst_spark.plans.catalog import QUERIES
from analyst_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
BIG = "/tmp/asp_scale_sf1"
COPIES = 10
OFFSET = 10_000_000

FAMILIES = {
    "documents": [
        "dedup_exact",
        "dedup_minhash",
        "dedup_lsh_verified",
        "dedup_simhash",
        "contamination_ngram",
        "docs_lm_score",
        "docs_dsir_weights",
        "docs_gopher_filter",
        "docs_dup_span",
        "docs_pack_sequences",
        "text_quality",
    ],
    "embeddings": [
        "dedup_embedding",
        "dedup_semantic",
        "dedup_semantic_trained",
        "ann_ivf_topk",
        "ann_lsh_topk",
        "ann_pca_ivf",
        "ann_cosine_topk",
        "embeddings_pca",
        "embeddings_quantize_int8",
    ],
    "events": [
        "events_hourly_rollup",
        "events_user_sessions",
        "events_funnel",
        "events_salted_rollup",
        "events_anomaly_zscore",
        "events_moving_avg",
    ],
}
DEFAULT = FAMILIES["documents"]


def build_big(spark) -> None:
    from pyspark.sql import functions as F

    from analyst_spark.tables import load_tables

    os.makedirs(BIG, exist_ok=True)
    tables = load_tables(spark, SRC)

    def replicate(name, per_copy):
        path = os.path.join(BIG, f"{name}.parquet")
        if os.path.exists(path):
            return
        parts = [per_copy(tables[name], k) for k in range(COPIES)]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(32).write.mode("overwrite").parquet(path)

    replicate(
        "documents",
        lambda docs, k: docs.select(
            (F.col("doc_id") + F.lit(k * OFFSET)).alias("doc_id"),
            F.concat(F.lit(f"copy{k} "), F.col("text")).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + F.lit(6)).alias("n_chars"),
        ),
    )
    # ±0.5% deterministic per-coordinate perturbation: copies are near
    # (cosine ≈ 0.99997) but not colinear, so sign-LSH buckets and
    # cluster structure see realistic density growth, and the gated
    # entries' planted x2 twins (vec_id + 1e6 < OFFSET) stay disjoint
    replicate(
        "embeddings",
        lambda emb, k: emb.select(
            (F.col("vec_id") + F.lit(k * OFFSET)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, j: (
                    x
                    * (
                        1.0
                        + (
                            F.pmod(
                                F.hash(F.col("vec_id"), j, F.lit(k)), F.lit(1000)
                            )
                            - 500
                        )
                        / 100000.0
                    )
                ).cast("float"),
            ).alias("embedding"),
        ),
    )
    replicate(
        "events",
        lambda ev, k: ev.select(
            (F.col("event_id") + F.lit(k * OFFSET)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * 1_000_000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
    )
    # remaining tables symlink through so load_tables resolves
    for f in os.listdir(SRC):
        dst = os.path.join(BIG, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f), dst)


def timed(spark, name: str, sf_dir: str) -> float:
    samples = []
    for _ in range(3):
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        release_cached(df)
        samples.append(time.time() - t0)
    return min(samples)


def main() -> None:
    argv = sys.argv[1:]
    names: list[str] = []
    if "--family" in argv:
        i = argv.index("--family")
        fam = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
        if fam == "all":
            for f in FAMILIES.values():
                names.extend(f)
        else:
            names.extend(FAMILIES[fam])
    names.extend(argv)
    names = names or DEFAULT
    spark = get_spark("scale_stress")
    build_big(spark)
    # warm codegen
    for name in names:
        for sf in ("/root/testdata/sf0.01", SRC, BIG):
            df = QUERIES[name](spark, sf)
            df.write.format("noop").mode("overwrite").save()
            release_cached(df)
    print(f"{'entry':26s} {'sf0.01':>7s} {'sf0.1':>7s} {'sf0.1x10':>9s} "
          f"{'10x ratio':>9s} {'100x ratio':>10s}")
    for name in names:
        t1 = timed(spark, name, "/root/testdata/sf0.01")
        t2 = timed(spark, name, SRC)
        t3 = timed(spark, name, BIG)
        print(
            f"{name:26s} {t1:6.2f}s {t2:6.2f}s {t3:8.2f}s "
            f"{t3 / t2:8.2f}x {t3 / t1:9.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
