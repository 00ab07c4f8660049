"""Measure sf0.01 -> sf0.1 scaling ratios for selected catalog
entries (the SCALE.md "Measured scaling" table). min-of-3 noop-forced
runs per (query, sf), caches released between passes so every number
is a cold per-invocation cost.

Usage: python tools/scaling_probe.py q1_pricing_summary dedup_minhash ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyst_spark.functions.dedup import release_cached
from analyst_spark.plans.catalog import QUERIES
from analyst_spark.session import get_spark

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    names = sys.argv[1:] or ["q1_pricing_summary"]
    spark = get_spark("scaling_probe")
    # warm codegen for every plan shape first
    for name in names:
        for sf in SFS:
            df = QUERIES[name](spark, sf)
            df.write.format("noop").mode("overwrite").save()
            release_cached(df)
    out = {}
    for name in names:
        mins = []
        for sf in SFS:
            samples = []
            for _ in range(3):
                t0 = time.time()
                df = QUERIES[name](spark, sf)
                df.write.format("noop").mode("overwrite").save()
                release_cached(df)
                samples.append(time.time() - t0)
            mins.append(min(samples))
        out[name] = mins
        print(
            f"{name:28s} sf0.01={mins[0]:5.2f}s  sf0.1={mins[1]:5.2f}s  "
            f"ratio={mins[1] / mins[0]:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
