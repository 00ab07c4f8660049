"""Fourth-decade scaling evidence: replicate the sf0.1 documents
table ×100 (≈500k docs) — one decade beyond the standing ×10 stress —
and time the core documents-family operators across sf0.01 / sf0.1 /
×10 / ×100. Same perturbed-replication rules as scale_stress.py
(distinct `copyNNN` prefix per copy: exact fingerprints differ,
shingle sets shift, vocab grows).

With ``--copies 1000`` it builds a ×1000 corpus (≈5M docs) for the
map-only / aggregation entries.

Usage: python tools/decade4_probe.py [--copies N] [entry ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyst_spark.functions.dedup import release_cached
from analyst_spark.plans.catalog import QUERIES
from analyst_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000

DEFAULT = [
    "dedup_exact",
    "text_quality",
    "docs_gopher_filter",
    "contamination_ngram",
    "docs_lm_score",
    "docs_curation_funnel_v2",
]


def build(spark, copies: int) -> str:
    from pyspark.sql import functions as F

    from analyst_spark.tables import load_tables

    big = f"/tmp/asp_decade4_x{copies}"
    path = os.path.join(big, "documents.parquet")
    os.makedirs(big, exist_ok=True)
    if not os.path.exists(path):
        docs = load_tables(spark, SRC)["documents"]
        k = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("__k")
        rep = docs.select("*", k).select(
            (
                F.col("doc_id")
                + F.col("__k").cast("long") * F.lit(OFFSET).cast("long")
            ).alias("doc_id"),
            F.concat(
                F.lit("copy"), F.col("__k").cast("string"), F.lit(" "),
                F.col("text"),
            ).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + F.lit(8)).alias("n_chars"),
        )
        rep.repartition(64).write.mode("overwrite").parquet(path)
    ev_path = os.path.join(big, "events.parquet")
    if os.path.islink(ev_path):
        os.remove(ev_path)  # earlier runs symlinked the sf0.1 table
    if not os.path.exists(ev_path):
        # growth by MORE USERS (scale_stress rule): per-user series
        # length constant, so sessionize/funnel state stays bounded
        # per key — how event volume actually grows
        ev = load_tables(spark, SRC)["events"]
        k = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("__k")
        rep = ev.select("*", k).select(
            (
                F.col("event_id")
                + F.col("__k").cast("long") * F.lit(OFFSET).cast("long")
            ).alias("event_id"),
            "ts",
            (
                F.col("user_id")
                + F.col("__k").cast("long") * F.lit(1_000_000).cast("long")
            ).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        rep.repartition(64).write.mode("overwrite").parquet(ev_path)
    for f in os.listdir(SRC):
        dst = os.path.join(big, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f), dst)
    return big


def timed(spark, name: str, sf_dir: str, reps: int = 2) -> float:
    best = None
    for _ in range(reps):
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        release_cached(df)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    argv = sys.argv[1:]
    copies = 100
    if "--copies" in argv:
        i = argv.index("--copies")
        copies = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    names = argv or DEFAULT
    spark = get_spark("decade4_probe")
    big = build(spark, copies)
    dirs = ["/root/testdata/sf0.01", SRC, big]
    for name in names:  # warm codegen everywhere
        for d in dirs:
            df = QUERIES[name](spark, d)
            df.write.format("noop").mode("overwrite").save()
            release_cached(df)
    print(
        f"{'entry':26s} {'sf0.01':>7s} {'sf0.1':>7s} {f'x{copies}':>9s} "
        f"{f'{copies}x ratio':>10s}"
    )
    for name in names:
        t1 = timed(spark, name, dirs[0])
        t2 = timed(spark, name, dirs[1])
        t3 = timed(spark, name, dirs[2])
        print(
            f"{name:26s} {t1:6.2f}s {t2:6.2f}s {t3:8.2f}s {t3 / t2:9.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
