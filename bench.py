"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Timing methodology: each query's full pipeline is forced with the
``noop`` writer (computes every output row distributed, no driver
collect — measures engine work, not result transfer). One untimed
warmup of a small query amortizes JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from analyst_spark.plans.catalog import QUERIES
from analyst_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# -- host-load calibration (r7) ---------------------------------------------
# The r6 driver artifact ran uniformly ~1.54x the builder's run of the
# SAME commit minutes earlier — pure host load, but it manufactured 20
# phantom "regressions" in round-over-round comparison. Every bench run
# now times a FIXED, never-changing probe (the r1-era q1 scan-agg shape
# on lineitem, defined inline here so catalog changes can't move it)
# before each pass and once at the end. The artifact records the probe
# samples, their median, the committed steady-state reference for this
# probe, and a load_factor = median/reference; value_normalized =
# value/load_factor is the host-load-corrected total. Read
# SCALE.md "Bench calibration" for how to interpret.
# Builder steady-state median measured IN-BENCH (same JIT warmth as
# the recorded samples): r7 committed run's calibration.median was
# 0.304 at sf0.1/local[32] on an idle host.
CAL_REFERENCE_SEC = 0.30

# r12 (VERDICT r11 #4): the JVM scan-shaped probe was blind to
# Python-worker drift — BENCH_r11's Arrow entries ran 15-25% above
# r10 while the probe read load ≈ 1.0. A second FIXED probe times the
# Arrow/Python path (mapInPandas numpy pass over lineitem, shape
# frozen as of r12); its steady-state median on an idle host at
# sf0.1/local[32] is the reference below (builder-measured in-bench,
# same JIT/worker warmth as the recorded samples). r12 calibration
# session: best observed sample 0.644 / medians 0.68-0.79 while the
# JVM probe read ~1.3x its own idle reference — 0.64 is therefore at
# or ABOVE the true idle steady state, which makes load_factor_py
# read conservatively low (never flatters the normalized total).
CAL_REFERENCE_PY_SEC = 0.64

# Headline entries whose hot path runs in Python workers (Arrow
# batches: mapInPandas decode/signature passes or pandas_udf
# signatures). Everything else is JVM/codegen-dominated. Used to pick
# which load factor normalizes which query.
PY_PATH_QUERIES = {
    "dedup_embedding",
    "dedup_incremental_embedding",
    "dedup_incremental_embedding_multiday",
    "ann_pca_ivf",
    "multimodal_perceptual_dedup",
    "multimodal_audio_perceptual_dedup",
    "multimodal_video_perceptual_dedup",
    "multimodal_incremental_perceptual",
    "multimodal_incremental_multiday",
    "multimodal_perceptual_dedup_wide",
}


def _calibration_probe(spark):
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    return (
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _calibration_probe_py(spark):
    """Fixed Arrow/Python-path probe (NEVER change this shape): one
    mapInPandas pass over two lineitem columns doing a numpy
    multiply-reduce per batch — times Arrow serialization + Python
    worker throughput, the path the perceptual/embedding entries
    live on."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(
        os.path.join(SF_DIR, "lineitem.parquet")
    ).select("l_quantity", "l_extendedprice")

    def part(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            q = pdf["l_quantity"].to_numpy(dtype="float64")
            p = pdf["l_extendedprice"].to_numpy(dtype="float64")
            yield pd.DataFrame({"s": [float((q * p).sum())],
                                "n": [len(pdf)]})

    return df.mapInPandas(part, "s double, n long").agg(
        F.sum("s").alias("s"), F.sum("n").alias("n")
    )

# Headline set: the relational core, every reference-operator family,
# and one of each training-data op (the LSH/IVF variants are the
# at-scale paths — brute-force twins are correctness-only).
#
# v7 (r7): + docs_curation_funnel_v2 — the five-stage curation report
# with the frozen-classifier stage (the composition a real corpus run
# executes); + ann_pca_ivf — the PCA-route/full-rerank ANN chain, now
# with its sweep-chosen 4/8 defaults.
#
# v6 (r6): + dedup_lsh_verified — the composed LSH-candidates →
# exact-jaccard-verify production chain (VERDICT r5 #3); its two
# halves (dedup_minhash, dedup_ngram_jaccard) stay for continuity.
# + dedup_pipeline_e2e — the full raw→exact→verify→components→
# representatives pipeline as one gated entry.
#
# v5 (r5): + docs_lm_score (bigram-LM perplexity), docs_dsir_weights
# (importance resampling), docs_gopher_filter (rule battery),
# docs_dup_span (duplicate-span accounting) — the LM-curation family
# added this round.
#
# v4 (r4): + docs_token_budget_mix (domain-mix prefix-sum sampler),
# events_funnel (ordered conversion funnel), doc_winnow_fingerprints
# (MOSS winnowing) — new curation/analytics coverage.
#
# v3 (r3): the two exact-twin scale-killers left the headline —
# agg_quantile (exact percentile = unbounded per-group buffer; the
# t-digest-class agg_quantile_approx IS the production form and stays)
# and ann_cosine_topk (BroadcastNestedLoopJoin exact baseline;
# ann_ivf_topk, its bucketed production form, replaces it). The bench
# now measures only plans one would actually run at 100 TB; exact
# twins remain in the catalog as oracle ground truth. The JSON carries
# headline_version + a common_with_prev subtotal so rounds stay
# comparable when the set moves.
# v11 (r11): agg_quantile_approx became the hash-gated exact-regime
# sketch (accuracy ≥ 2×group rows — deterministic but buffer-heavy at
# bench SF, the shape v3 removed); the bench row moves to
# agg_quantile_sketch, the default-accuracy production sketch, which
# is the identical plan the old row measured.
# v12 (r12): + the perceptual/embedding 3-day lifecycles, the
# wide-band (32-bit) perceptual variant, and the maintained IVF
# serving index — the r12 additions, each tagged below.
# v13 (r13): + the confidence-scaled adaptive IVF entry (25-query
# sweep set incl. the low-confidence neighborhoods). Existing rows
# ann_pca_ivf / ann_ivf_trained / ann_ivf_incremental now run
# adaptive probing and docs_global_shuffle/_shuffled_pack auto-size
# their shards — same keys, measured as the new defaults.
# v14 (r14): + contamination_delta_stateful, docs_curriculum_pack,
# ann_quantized_rerank, docs_epoch_shuffle, docs_perplexity_buckets
# — the r14 additions, each tagged in the list below.
HEADLINE_VERSION = 14
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue_change",
    "q10_returned_items",
    "q16_supplier_part_counts",
    "q21_last_to_ship",
    "window_top_orders",
    "events_moving_avg",
    "events_cohort_retention",
    "docs_train_test_split",
    "docs_token_budget_mix",
    "events_funnel",
    "agg_reducers",
    "agg_quantile_sketch",
    "agg_zoh",
    "lookup_inner",
    "apply_cast",
    "events_hourly_rollup",
    "events_user_sessions",
    "text_quality",
    "text_langid",
    "contamination_ngram",
    "text_top_tokens",
    "doc_winnow_fingerprints",
    "docs_lm_score",
    "docs_lm_backoff_score",
    "docs_dsir_weights",
    "docs_gopher_filter",
    "docs_dup_span",
    "docs_dedup_spans",
    "dedup_exact",
    "dedup_minhash",
    "dedup_lsh_verified",
    "dedup_pipeline_e2e",
    "dedup_simhash",
    "dedup_embedding",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_pca_ivf",
    "docs_curation_funnel_v2",
    "knn_label_propagation",
    "orders_merge_upsert",
    "aql_lookup_aggregate_pipeline",
    # r8 additions: bloom-pruned semi-join, BM25 ranking, CMS head
    "lineitem_bloom_semijoin",
    "docs_bm25_topk",
    "text_heavy_hitters_cms",
    # r9 additions: hybrid RRF retrieval, gap-fill interpolation,
    # single-pass profiling, z-order layout comparison, exact
    # prefix-filter similarity join (recall-1 production path at
    # high thresholds), value histogram
    "docs_rrf_hybrid",
    "events_gapfill_interpolate",
    "events_gapfill_routed",
    "lineitem_profile",
    "lineitem_zorder_layout",
    "dedup_jaccard_prefix",
    "events_value_histogram",
    # r9 late: eval-set decontamination audit (split-crossing
    # near-dup pairs on the recall-1 prefix join); PMI collocation
    # mining (exact integer lift). events_anomaly_mad stays
    # catalog-only: exact per-group medians are the agg_quantile
    # boundary the v3 note documents (approx=True is the at-scale
    # form, banded in tests).
    "docs_split_leakage",
    "docs_collocations_pmi",
    "docs_quality_prune_curve",
    "docs_consistent_sample",
    "dedup_containment",
    # r10 additions: batch-vs-history incremental near-dup (the
    # daily-ingest shape), perceptual image near-dup (banded Hamming),
    # one-pass multi-query BM25, and the 100 TB profile configuration
    # (HLL, no Expand). dedup_neardup_routed is NOT measured — on this
    # corpus it is dedup_jaccard_prefix plus a bounded probe, and the
    # prefix join is already a headline entry.
    "dedup_incremental_neardup",
    "dedup_incremental_multiday",
    "multimodal_perceptual_dedup",
    "multimodal_audio_perceptual_dedup",
    "docs_bm25_multi",
    "docs_rrf_hybrid_multi",
    "lineitem_profile_approx",
    # r11 additions: video perceptual near-dup (frame-aligned banded
    # Hamming + frame-majority), incremental perceptual ingest
    # (batch vs maintained dHash index), span-routed gapfill (above)
    "multimodal_video_perceptual_dedup",
    "multimodal_incremental_perceptual",
    "dedup_incremental_embedding",
    # r12 additions: the perceptual and embedding 3-day lifecycles
    # (shared incremental module, day-boundary plants), and the
    # wide-band (128-bit dHash / 32-bit bands) perceptual variant —
    # the >=10M-signature configuration
    "multimodal_incremental_multiday",
    "dedup_incremental_embedding_multiday",
    "multimodal_perceptual_dedup_wide",
    # r12: maintained IVF serving index (append == rebuild);
    # dedup_incremental_clusters stays catalog-only — it is the
    # multiday entry plus a components loop, and both halves are
    # already measured (multiday here, components via dedup_clusters'
    # family in the catalog gates)
    "ann_ivf_incremental",
    # r12 (session 2): the decontamination trio completion — the
    # bloom-pruned exact path (same answer as contamination_ngram, so
    # the pair is a live A/B of broadcast-set vs bloom+verify), the
    # cross-corpus fuzzy member, the semantic member — plus the
    # seeded global training-order shuffle (single exchange)
    "contamination_bloom",
    "contamination_minhash",
    "contamination_embedding",
    "docs_global_shuffle",
    "docs_shuffled_pack",
    "docs_curation_funnel_v3",
    # r13: the adaptive probe rule as its own hash-gated measurement,
    # the eval-suite-update delta decontamination, and the
    # quality-tier curriculum ordering
    "ann_ivf_adaptive",
    "contamination_delta",
    "docs_curriculum_order",
    # r14: stateful suite-update decontamination (the maintained-state
    # form of contamination_delta) and curriculum-ordered packing
    # (curriculum ∘ pack on the one (tier, shard) exchange)
    "contamination_delta_stateful",
    "docs_curriculum_pack",
    # r14: int8-quantized candidate scan + exact rerank — the
    # memory-bandwidth serving path, fully hash-gated
    "ann_quantized_rerank",
    # r14: E epochs of training order, one manifest scan + one
    # (epoch, shard) exchange
    "docs_epoch_shuffle",
    # r14: CCNet language-stratified perplexity tertiles — bounded
    # milli-log histogram cuts broadcast back onto the corpus
    "docs_perplexity_buckets",
]


def force(df) -> None:
    from analyst_spark.functions.dedup import release_cached

    df.write.format("noop").mode("overwrite").save()
    # LSH-style plans persist their bucket tables; release them after
    # the consuming action or repeated invocations in this long-lived
    # session pin bands x n rows of cache per pass.
    release_cached(df)


def main() -> None:
    spark = get_spark("analyst_spark_bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Warmup at the smallest SF: whole-stage codegen compiles per plan
    # shape (1-5s each, first run only); measuring steady-state engine
    # throughput requires compiling every plan before timing.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for name in BENCH_QUERIES:
        try:
            force(QUERIES[name](spark, warm_dir))
        except Exception:
            pass
    # Pull the input files into the OS page cache: the test host's
    # disk shows multi-second iowait stalls; steady-state reads (what
    # a warm cluster sees) are the thing being measured.
    for fn in os.listdir(SF_DIR):
        if fn.endswith(".parquet"):
            with open(os.path.join(SF_DIR, fn), "rb") as f:
                while f.read(1 << 24):
                    pass

    # Three interleaved passes, min per query: the test host (shared
    # VM) shows multi-second transient stalls — a single-shot timing
    # can charge one query 10x for a host hiccup, and r4 recorded a
    # stall that survived min-of-2-plus-retry (dedup_minhash 3.94s vs
    # 0.85s steady state). Min-of-3 across separate passes, with every
    # sample recorded in the artifact, means a stall can never be the
    # reported number without the artifact itself showing the spread.
    # calibration probe warmups (codegen compile / worker fork, untimed)
    force(_calibration_probe(spark))
    force(_calibration_probe_py(spark))

    def time_cal(probe) -> float:
        t0 = time.time()
        force(probe(spark))
        return round(time.time() - t0, 3)

    cal_samples: list[float] = []
    cal_py_samples: list[float] = []
    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for _pass in range(3):
        cal_samples.append(time_cal(_calibration_probe))
        cal_py_samples.append(time_cal(_calibration_probe_py))
        for name in BENCH_QUERIES:
            t0 = time.time()
            force(QUERIES[name](spark, SF_DIR))
            samples[name].append(round(time.time() - t0, 3))
    cal_samples.append(time_cal(_calibration_probe))
    cal_py_samples.append(time_cal(_calibration_probe_py))
    # Adaptive extra sample: when a query's passes still disagree by
    # >1.5x, at least one was stall-inflated and the min itself may
    # carry part of a stall (observed: the same plan timing 4.6s and
    # 31s back-to-back). Re-time just the disagreeing queries once
    # more — bounded extra cost, targeted exactly at the stall victims.
    for name in BENCH_QUERIES:
        s = samples[name]
        if max(s) / max(min(s), 1e-9) > 1.5:
            t0 = time.time()
            force(QUERIES[name](spark, SF_DIR))
            samples[name].append(round(time.time() - t0, 3))
    times = {name: min(s) for name, s in samples.items()}

    total = round(sum(times.values()), 3)

    def _median(s: list[float]) -> float:
        # Trim the single largest sample first: a host stall during
        # one probe must not inflate the load factor (a HIGH factor
        # flatters the normalized total — r13's calibration carried a
        # 1.556s stall sample against a 0.33-0.48s steady state and
        # recorded 1.603 where the stall-free median said ~1.5). The
        # ≥1.0 clamp below already guards the other direction.
        t = sorted(s)[:-1] if len(s) > 2 else sorted(s)
        return t[len(t) // 2]

    cal_median = _median(cal_samples)
    cal_py_median = _median(cal_py_samples)
    # load_factor 1.0 = the machine is as fast as when the reference
    # was committed; 1.5 = everything on that path runs ~1.5x slower
    # right now. Never below 1.0: a lucky probe must not inflate the
    # normalized claim. Two factors since r12 (VERDICT r11 #4): the
    # JVM scan probe and the Arrow/Python probe drift independently
    # on this host, and most of the catalog's expensive entries live
    # on the Python path.
    load_factor = max(1.0, round(cal_median / CAL_REFERENCE_SEC, 3))
    load_factor_py = max(
        1.0, round(cal_py_median / CAL_REFERENCE_PY_SEC, 3)
    )

    def factor_of(name: str) -> float:
        return load_factor_py if name in PY_PATH_QUERIES else load_factor

    def normalized(names) -> float:
        return round(sum(times[q] / factor_of(q) for q in names), 3)

    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "headline_version": HEADLINE_VERSION,
        "calibration": {
            "probe": "q1-shape lineitem scan-agg (fixed since r7)",
            "samples": cal_samples,
            "median": cal_median,
            "reference_sec": CAL_REFERENCE_SEC,
            "load_factor": load_factor,
            "load_factor_jvm": load_factor,
            "probe_py": "mapInPandas numpy multiply-reduce over "
                        "lineitem (fixed since r12)",
            "samples_py": cal_py_samples,
            "median_py": cal_py_median,
            "reference_py_sec": CAL_REFERENCE_PY_SEC,
            "load_factor_py": load_factor_py,
        },
        # per-path normalization: each query divided by the factor of
        # the path it runs on (PY_PATH_QUERIES ride the Arrow probe)
        "value_normalized": normalized(times),
    }
    # like-for-like subtotal against the latest recorded round, so a
    # headline-set change never reads as a perf regression
    prev = _latest_prev_bench()
    if prev and prev.get("sf") == out["sf"]:
        common = sorted(set(times) & set(prev.get("queries", {})))
        out["common_with_prev"] = {
            "n": len(common),
            "total": round(sum(times[q] for q in common), 3),
            "total_normalized": normalized(common),
            "prev_total": round(
                sum(prev["queries"][q] for q in common), 3
            ),
            "prev_file": prev["__file"],
        }
    # Full artifact (with the per-query sample arrays) goes to a file:
    # the driver captures a bounded TAIL of stdout, and r5's line with
    # samples inline exceeded it, truncating the JSON mid-line
    # ("parsed": null). stdout gets ONE compact line; the spread
    # evidence lives in BENCH_DETAIL.json — ALSO archived per round as
    # BENCH_DETAIL_r{NN}.json (VERDICT r11 #5: the driver artifact's
    # tail truncation has eaten the stdout JSON twice; the committed
    # per-round detail is what keeps round-over-round comparison
    # honest — _latest_prev_bench prefers it).
    detail = dict(out)
    detail["samples"] = samples
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    rnd = _current_round(here)
    if rnd is not None:
        with open(
            os.path.join(here, f"BENCH_DETAIL_r{rnd:02d}.json"), "w"
        ) as f:
            json.dump(detail, f, indent=1)
        out["detail_file"] = f"BENCH_DETAIL_r{rnd:02d}.json"
    else:
        out["detail_file"] = "BENCH_DETAIL.json"
    print(json.dumps(out))


def _current_round(here: str) -> int | None:
    """The round this bench run belongs to = one past the highest
    round the driver has recorded (BENCH_r{N}.json files are written
    by the driver at the END of round N, so during round 12 the
    newest is r11)."""
    import re as _re

    rounds = [
        int(m.group(1))
        for fn in os.listdir(here)
        if (m := _re.fullmatch(r"BENCH_r(\d+)\.json", fn))
    ]
    return max(rounds) + 1 if rounds else None


def _latest_prev_bench() -> dict | None:
    """Most recent prior round with USABLE per-query times. The
    driver's own BENCH_r{N}.json is authoritative when its JSON
    survived the bounded tail capture; the committed
    BENCH_DETAIL_r{N}.json is the FALLBACK for rounds whose stdout
    JSON was truncated (r5, r9/r10 — VERDICT r11 #5). Driver-first
    ordering also defuses the stamp hazard of _current_round: a
    bench rerun made AFTER the driver recorded round N would write a
    stray BENCH_DETAIL_r{N+1}.json, which must not outrank round
    N+1's real driver artifact (r12 review). Rounds with neither
    usable are skipped rather than silently comparing against an
    empty query set."""
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for fn in os.listdir(here):
        m = _re.fullmatch(r"BENCH_r(\d+)\.json", fn)
        if m:
            rounds.append((int(m.group(1)), fn))
    for n, fn in sorted(rounds, reverse=True):
        for cand in (fn, f"BENCH_DETAIL_r{n:02d}.json"):
            try:
                with open(os.path.join(here, cand)) as f:
                    data = json.load(f)
            except Exception:
                continue
            # driver wraps our JSON line under "parsed"
            if "queries" not in data and isinstance(
                data.get("parsed"), dict
            ):
                data = data["parsed"]
            if not data.get("queries"):
                continue
            data["__file"] = cand
            return data
    return None


if __name__ == "__main__":
    main()
