"""Direct measurement of the bloom decontamination WIN regime
(VERDICT r12 #3).

contamination_bloom's claimed advantage is the regime where the
benchmark n-gram set is too big to broadcast, forcing the exact path
to shuffle every corpus posting. The r12 ×1000 probe only reached
parity because the bench side (doc_id % 97) stayed broadcastable.
This probe makes the regime real:

* corpus: the ×1000 perturbed-replication documents table (~5M docs,
  built/cached by tools/decade4_probe.py --copies 1000), with the
  copy index folded into the gram hash (``xxhash64(gram, copy)``):
  the replicated copies share most literal 8-grams, which would cap
  bench cardinality at ~650k — folding the copy models the genuinely
  distinct text a real 5M-doc crawl has, and both paths consume the
  identical hashed postings so the comparison is unaffected;
* bench membership widened to ``doc_id % BENCH_MOD == 0`` with
  BENCH_MOD=8 → ~625k bench docs, ≥30M distinct gram hashes
  (measured and printed);
* ``spark.sql.autoBroadcastJoinThreshold=-1`` for BOTH paths, so the
  exact membership joins genuinely shuffle (the 100 TB shape);
* both paths run the catalog entries' exact arithmetic (shared
  shingle→xxhash64 pipeline, same ≥0.5 overlap filter), and the probe
  asserts their results are IDENTICAL via sorted row checksums
  before reporting walls;
* the bloom path is measured at the capped auto size
  (sized_bits → 2^26, FP degraded by saturation) AND at the
  per-key-sized table (16 bits/key), reporting word-table size and
  the MEASURED false-positive rate (survivors − true matches) /
  non-matching postings.

Usage: python tools/bloom_regime_probe.py [bench_mod] [copies]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analyst_spark.functions.bloom import bloom_semi_join, sized_bits
from analyst_spark.plans.pipeline_plans import _NGRAM_N, _ngrams
from analyst_spark.session import get_spark

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from decade4_probe import build  # noqa: E402  (same cached corpus)


COPY_OFFSET = 10_000_000  # decade4_probe's per-copy doc_id stride


def shingled(spark, path: str):
    docs = spark.read.parquet(os.path.join(path, "documents.parquet"))
    copy = (F.col("doc_id") / COPY_OFFSET).cast("long")
    return docs.select(
        "doc_id", copy.alias("__c"), F.split(F.col("text"), " ").alias("t")
    ).select(
        "doc_id",
        F.transform(
            _ngrams(F.col("t"), _NGRAM_N),
            lambda g: F.xxhash64(g, F.col("__c")),
        ).alias("gs"),
    )


def finish(scored):
    return (
        scored.withColumn(
            "overlap_ratio",
            F.round(F.col("n_matched") / F.col("n_ngrams"), 6),
        )
        .filter(F.col("overlap_ratio") >= 0.5)
        .select(
            "doc_id",
            F.col("n_ngrams").cast("long").alias("n_ngrams"),
            F.col("n_matched").cast("long").alias("n_matched"),
            "overlap_ratio",
        )
    )


def checksum(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64(
                "doc_id", "n_ngrams", "n_matched", "overlap_ratio"
            ).cast("decimal(38,0)")  # ANSI: long sum of 5M hashes overflows
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"] or 0)


def main() -> None:
    bench_mod = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    # the shared session disables the UI; this probe needs the REST
    # stage metrics, so it builds its own session with the UI on
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .appName("bloom_regime_probe")
        .config("spark.driver.memory", "32g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/tmp/spark-local"),
        )
        .getOrCreate()
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    _ = get_spark  # the shared builder stays the import for other probes
    big = build(spark, copies)

    toks = shingled(spark, big).persist()
    n_docs = toks.count()
    bench = (
        toks.filter(F.col("doc_id") % bench_mod == 0)
        .select(F.explode("gs").alias("g"))
        .distinct()
        .persist()
    )
    n_bench = bench.count()
    exploded = toks.select(
        "doc_id", F.size("gs").alias("n_ngrams"), F.explode("gs").alias("g")
    )
    n_postings = exploded.count()
    true_matches = exploded.join(bench, "g", "left_semi").count()
    print(
        f"corpus={n_docs} docs, postings={n_postings}, "
        f"bench keys={n_bench} (mod {bench_mod}), "
        f"true-matching postings={true_matches}",
        flush=True,
    )

    results = {}
    walls: dict[str, list[float]] = {}
    shuffle_bytes: dict[str, list[int]] = {}

    import json
    import urllib.request

    def total_shuffle_write(sc) -> int:
        """Cumulative shuffle write bytes across all completed stages
        (Spark UI REST API) — per-pass deltas give each path's REAL
        shuffle volume, the currency that prices the 100 TB regime."""
        base = sc.uiWebUrl
        apps = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications")
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages?status=complete"
            )
        )
        return sum(st.get("shuffleWriteBytes", 0) for st in stages)

    def run_exact():
        return checksum(
            finish(
                exploded.join(bench, "g")
                .groupBy("doc_id", "n_ngrams")
                .agg(F.count(F.lit(1)).alias("n_matched"))
            )
        )

    def run_bloom(n_bits):
        from analyst_spark.functions.dedup import release_cached

        pruned = bloom_semi_join(exploded, "g", bench, "g", n_bits=n_bits)
        out = checksum(
            finish(
                pruned.groupBy("doc_id", "n_ngrams")
                .agg(F.count(F.lit(1)).alias("n_matched"))
            )
        )
        release_cached(pruned)  # drop this pass's word-table cache
        return out

    # per-key sizing at 30M+ keys wants 2^30 bits; the executor-side
    # word table bounds the local probe at 2^28 (32 MiB of words — on
    # a cluster the 2^30 table is a 128 MiB broadcast, still fine)
    per_key = min(1 << (n_bench * 16 - 1).bit_length(), 1 << 28)
    variants = [
        ("exact-shuffle", None),
        ("bloom-capped-auto", sized_bits(n_bench)),
        ("bloom-28", per_key),
    ]
    # min-of-2 INTERLEAVED passes: this host shows multi-second
    # transient stalls (2.7x swings between back-to-back runs), so
    # single-shot path comparisons are meaningless
    for pss in range(2):
        for label, n_bits in variants:
            sw0 = total_shuffle_write(spark.sparkContext)
            t0 = time.time()
            results[label] = (
                run_exact() if n_bits is None else run_bloom(n_bits)
            )
            walls.setdefault(label, []).append(time.time() - t0)
            shuffle_bytes.setdefault(label, []).append(
                total_shuffle_write(spark.sparkContext) - sw0
            )
            print(
                f"  pass {pss} {label}: {walls[label][-1]:.1f}s "
                f"shuffle={shuffle_bytes[label][-1] / 1e6:.0f} MB",
                flush=True,
            )

    from analyst_spark.functions.bloom import bloom_build, bloom_prune

    for label, n_bits in variants:
        extra = ""
        if n_bits is not None:
            rows = bloom_build(bench, "g", n_bits).collect()
            words = spark.createDataFrame(
                rows, "word_idx long, bits long"
            )
            survivors = bloom_prune(exploded, "g", words, n_bits).count()
            fp = (survivors - true_matches) / max(
                n_postings - true_matches, 1
            )
            extra = (
                f" n_bits=2^{n_bits.bit_length() - 1}"
                f" ({n_bits // 8 // 1024 // 1024} MiB words)"
                f" survivors={survivors} measured FP={fp:.4f}"
            )
        print(
            f"{label}: min={min(walls[label]):.1f}s "
            f"passes={[round(w, 1) for w in walls[label]]} "
            f"shuffleMB={[round(b / 1e6) for b in shuffle_bytes[label]]} "
            f"rows={results[label][0]}{extra}",
            flush=True,
        )

    assert len(set(results.values())) == 1, f"paths diverged: {results}"
    print(
        f"all {len(results)} paths identical "
        f"(rows={results['exact-shuffle'][0]}, checksum match)",
        flush=True,
    )


if __name__ == "__main__":
    main()
