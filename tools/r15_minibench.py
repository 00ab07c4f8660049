"""Single-query bench replica (guide §1.4): the exact per-query
methodology of bench.py — sf0.001 codegen warmup, page-cache prefetch,
N construct+force passes, min — for a chosen subset of queries, so a
code variant can be judged on the real bench metric without a full
87-query run. Prints one JSON line per query with every sample.

Usage: python tools/r15_minibench.py [--passes=N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyst_spark.plans.catalog import QUERIES
from analyst_spark.session import get_spark
from bench import force

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    passes = 3
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--passes="):
            passes = int(a.split("=")[1])
        else:
            names.append(a)
    spark = get_spark("r15_minibench")
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        force(QUERIES[name](spark, warm_dir))
    for fn in os.listdir(SF_DIR):
        if fn.endswith(".parquet"):
            with open(os.path.join(SF_DIR, fn), "rb") as f:
                while f.read(1 << 24):
                    pass
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        for name in names:
            t0 = time.time()
            force(QUERIES[name](spark, SF_DIR))
            samples[name].append(round(time.time() - t0, 3))
    for name in names:
        print(
            json.dumps(
                {
                    "query": name,
                    "min": min(samples[name]),
                    "samples": samples[name],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
