"""Three-decade scaling evidence: build a 10x-sf0.1 documents corpus
(~50k docs) by perturbed replication of the driver's sf0.1 table and
time the documents-family operators on sf0.01 / sf0.1 / sf0.1x10.

Replication detail: copy k of doc d gets doc_id = d + k*OFFSET and a
distinct "copyk" prefix token, so exact-dedup fingerprints differ,
shingle sets shift, and near-dup operators see realistic (not
degenerate) growth. The derived corpus lives under /tmp and is a
measurement artifact only — correctness gates always run on the
driver's own parquet.

Usage: python tools/scale_stress.py [entry ...]
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

DEFAULT = [
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "contamination_ngram",
    "docs_lm_score",
    "docs_dsir_weights",
    "docs_gopher_filter",
    "docs_dup_span",
    "docs_pack_sequences",
    "text_quality",
]


def build_big(spark) -> None:
    from pyspark.sql import functions as F

    from analyst_spark.tables import load_tables

    if os.path.exists(os.path.join(BIG, "documents.parquet")):
        return
    os.makedirs(BIG, exist_ok=True)
    docs = load_tables(spark, SRC)["documents"]
    parts = []
    for k in range(COPIES):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * OFFSET)).alias("doc_id"),
                F.concat(F.lit(f"copy{k} "), F.col("text")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + F.lit(6)).alias("n_chars"),
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(BIG, "documents.parquet")
    )
    # events/embeddings not replicated: this probe covers the
    # documents family; symlink the rest so load_tables resolves.
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
    names = sys.argv[1:] or DEFAULT
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
