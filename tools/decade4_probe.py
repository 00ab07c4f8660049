"""Fourth-decade scaling evidence: replicate the sf0.1 documents
table ×100 (≈500k docs) — one decade beyond the standing ×10 stress —
and time the core documents-family operators across sf0.01 / sf0.1 /
×10 / ×100. Same perturbed-replication rules as scale_stress.py
(distinct `copyNNN` prefix per copy: exact fingerprints differ,
shingle sets shift, vocab grows).

With ``--copies 1000`` it builds a ×1000 corpus (≈5M docs) for the
map-only / aggregation entries.

Usage: python tools/decade4_probe.py [--copies N] [--json FILE] [entry ...]

``--json FILE`` writes the standing scaling artifact (VERDICT r13
#7): one object per entry with the three walls and the big/sf0.1
growth ratio, so the next round can DIFF scaling shape the way
BENCH_DETAIL is diffed, instead of re-quoting prose. The committed
``SCALE_PROBE.json`` comes from ``--copies 1000`` over
``SCALE_ENTRIES``.
"""

from __future__ import annotations

import json
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

# The standing scale-sensitive set (VERDICT r13 #7): entries whose
# growth SHAPE matters at 100 TB — candidate generation, shuffles,
# broadcast regimes, curriculum/shuffle exchanges — probed at ×1000
# and committed as SCALE_PROBE.json each round.
SCALE_ENTRIES = [
    "dedup_exact",
    # dedup_minhash is deliberately NOT here: build() grows the corpus
    # by near-copying every document 1000× ("copy{k} " prefix), which
    # turns the near-dup entries' TRUE answer quadratic (every doc
    # gains 999 genuine near-dups → ~1000²/2 pairs per source doc;
    # the band join spilled >60 GB before being killed, r14). That is
    # a dup-storm measurement, not a growth-shape one — and the dup
    # storm is measured, with caps and dropped-work accounting, by
    # tools/dup_storm_probe.py. Near-dup growth shape needs a corpus
    # of DISTINCT documents, which the replicator cannot produce.
    "text_quality",
    "docs_gopher_filter",
    "contamination_ngram",
    "contamination_bloom",
    "contamination_delta",
    "contamination_delta_update",
    "docs_lm_score",
    "docs_curation_funnel_v3",
    "docs_global_shuffle",
    "docs_epoch_shuffle",
    "docs_shuffled_pack",
    "docs_curriculum_order",
    "docs_curriculum_pack",
    "docs_bm25_topk",
    "doc_fingerprints",
]

# --- probes that are PHASES of an entry, not whole catalog entries.
# contamination_delta_update = the suite-update phase of
# contamination_delta_stateful against PREBUILT v1-gram state: what a
# deployment pays per suite update once the prior run has written its
# state (the whole point of VERDICT r13 #2 — the v1-gram recompute
# was the entry's 36x-per-1000x superlinear share).
_DELTA_STATE: dict[str, str] = {}


def _delta_update_probe(spark, sf_dir):
    import tempfile

    from analyst_spark.plans.pipeline_plans import (
        build_v1_gram_state,
        delta_update_from_state,
    )

    if sf_dir not in _DELTA_STATE:
        d = tempfile.mkdtemp(prefix="asp_probe_delta_state_")
        build_v1_gram_state(spark, sf_dir, d)
        _DELTA_STATE[sf_dir] = d
    return delta_update_from_state(spark, sf_dir, _DELTA_STATE[sf_dir])


PHASE_PROBES = {"contamination_delta_update": _delta_update_probe}


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


def _fn(name: str):
    return PHASE_PROBES.get(name) or QUERIES[name]


def _reap_shuffles(spark) -> None:
    """Shuffle files live until the driver's ContextCleaner notices
    the ShuffleDependency is unreachable — which needs a JVM GC, and
    the periodic one fires every 30 min (spark.cleaner.periodicGC).
    A ×1000 probe runs ~100 shuffle-heavy jobs back-to-back in ONE
    session and outruns that: spills accumulated 34 GB before the
    first timed entry and ENOSPC'd the host (r14). Force the GC after
    every entry so the probe's disk footprint is one entry's worth."""
    import gc

    gc.collect()  # drop Python-side DataFrame refs first
    spark.sparkContext._jvm.System.gc()


def timed(spark, name: str, sf_dir: str, reps: int = 2) -> float:
    best = None
    for _ in range(reps):
        t0 = time.time()
        df = _fn(name)(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        release_cached(df)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    _reap_shuffles(spark)
    return best


def main() -> None:
    argv = sys.argv[1:]
    copies = 100
    json_out = None
    if "--copies" in argv:
        i = argv.index("--copies")
        copies = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if argv == ["--scale-set"]:
        argv = list(SCALE_ENTRIES)
    names = argv or DEFAULT
    spark = get_spark("decade4_probe")
    big = build(spark, copies)
    dirs = ["/root/testdata/sf0.01", SRC, big]
    for name in names:  # warm codegen everywhere
        for d in dirs:
            print(f"warm {name} @ {d}", flush=True)
            df = _fn(name)(spark, d)
            df.write.format("noop").mode("overwrite").save()
            release_cached(df)
        _reap_shuffles(spark)
    print(
        f"{'entry':26s} {'sf0.01':>7s} {'sf0.1':>7s} {f'x{copies}':>9s} "
        f"{f'{copies}x ratio':>10s}"
    )
    report = {"copies": copies, "src": SRC, "entries": {}}
    for name in names:
        t1 = timed(spark, name, dirs[0])
        t2 = timed(spark, name, dirs[1])
        t3 = timed(spark, name, dirs[2])
        print(
            f"{name:26s} {t1:6.2f}s {t2:6.2f}s {t3:8.2f}s {t3 / t2:9.2f}x",
            flush=True,
        )
        report["entries"][name] = {
            "sf0.01": round(t1, 2),
            "sf0.1": round(t2, 2),
            f"x{copies}": round(t3, 2),
            "growth": round(t3 / t2, 2),
        }
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {json_out}", flush=True)


if __name__ == "__main__":
    main()
