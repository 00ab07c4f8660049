"""Hot-key window-skew probe (SCALE.md r7/r8): plant a 1M-event user
atop sf0.1 events and time plain single-window sessionization vs the
chunked operator (operators/sessionize.py) with hot-threshold
routing. The chunked path bounds per-task sort state by (user, time
slice) instead of (user), so one pathological key no longer
straggles the stage linearly with its lifetime volume.

Usage: python tools/hotkey_probe.py [n_hot_events]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analyst_spark.operators.sessionize import (
    _plain_sessions,
    sessionize_chunked,
)
from analyst_spark.session import get_spark
from analyst_spark.tables import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_HOT = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
HOT_USER = 999_999_999


def build(spark):
    ev = load_tables(spark, SF_DIR)["events"].select(
        "user_id", "ts", "event_id"
    )
    # 1M events over 30 days on one user (~2.6s cadence: a bot)
    hot = spark.range(N_HOT).select(
        F.lit(HOT_USER).cast("long").alias("user_id"),
        F.timestamp_seconds(
            F.unix_timestamp(F.to_timestamp(F.lit("2024-01-01 00:00:00")))
            + (F.col("id") * 2.59).cast("long")
        ).alias("ts"),
        (F.col("id") + 10_000_000).alias("event_id"),
    )
    out = ev.unionByName(hot).repartition(32).persist()
    out.count()
    return out


def timed(label, fn):
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn().collect()
        best = min(best, time.time() - t0)
    print(f"{label}: {best:.2f}s", flush=True)
    return best


def main():
    spark = get_spark("hotkey-probe")
    ev = build(spark)
    r = {}
    r["plain"] = timed(
        "plain window", lambda: _plain_sessions(ev, "user_id", "ts", "event_id", 1800)
    )
    r["chunked_all"] = timed(
        "chunked (everyone)", lambda: sessionize_chunked(ev)
    )
    r["chunked_routed"] = timed(
        "chunked (hot_threshold=50k)",
        lambda: sessionize_chunked(ev, hot_threshold=50_000),
    )
    # sanity: identical results
    a = sorted(map(tuple, _plain_sessions(ev, "user_id", "ts", "event_id", 1800).collect()))
    b = sorted(map(tuple, sessionize_chunked(ev, hot_threshold=50_000).collect()))
    print("results equal:", a == b, flush=True)
    print({k: round(v, 2) for k, v in r.items()}, flush=True)


if __name__ == "__main__":
    main()
