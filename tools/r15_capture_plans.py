"""Capture .explain("formatted") for headline queries into
plans/r15/<query>_<tag>.txt (tag = before/after). Explain only — no
jobs are executed, so this is safe to run alongside other work.

Usage: python tools/r15_capture_plans.py <tag> [query ...]
       (no query args = all BENCH_QUERIES)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyst_spark.plans.catalog import QUERIES
from analyst_spark.session import get_spark
from bench import BENCH_QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or list(BENCH_QUERIES)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("r15_plan_capture")
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # record the failure, keep going
            plan = f"EXPLAIN FAILED: {exc!r}\n"
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} bytes", flush=True)


if __name__ == "__main__":
    main()
