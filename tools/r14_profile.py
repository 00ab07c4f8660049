"""Per-query empirical profile (guide §1.1): run each headline query
with the noop sink under a dedicated job group, then read the UI REST
API for the jobs/stages it ran — job count, total task time, shuffle
read/write bytes, and the slowest stages. Prints one JSON line per
query and a sorted summary.

Usage: SPARK_GRAFT_UI=1 python tools/r14_profile.py [query ...]
       (no args = all BENCH_QUERIES; add --passes N for min-of-N wall)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "1")

from analyst_spark.plans.catalog import QUERIES
from analyst_spark.session import get_spark
from bench import BENCH_QUERIES, force

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.load(r)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 1
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=")[1])
    names = args or list(BENCH_QUERIES)
    spark = get_spark("r14_profile")
    sc = spark.sparkContext
    base = sc.uiWebUrl + "/api/v1/applications/" + sc.applicationId
    # warmup: compile codegen for every profiled plan at sf0.001
    warm = "/root/testdata/sf0.001"
    for name in names:
        try:
            force(QUERIES[name](spark, warm))
        except Exception:
            pass

    rows = []
    for name in names:
        best = None
        for p in range(passes):
            group = f"{name}#{p}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = QUERIES[name](spark, SF_DIR)
            t_build = time.time() - t0
            force(df)
            wall = time.time() - t0
            sc.setJobGroup(None, None)
            if best is None or wall < best[0]:
                best = (wall, t_build, group)
        wall, t_build, group = best
        jobs = [
            j
            for j in _api(base, "/jobs")
            if j.get("jobGroup") == group
        ]
        stage_ids = sorted(
            {s for j in jobs for s in j.get("stageIds", [])}
        )
        stages = []
        for sid in stage_ids:
            try:
                for att in _api(base, f"/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        tot_task = sum(s.get("executorRunTime", 0) for s in stages)
        sh_r = sum(s.get("shuffleReadBytes", 0) for s in stages)
        sh_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        py_t = sum(
            s.get("executorDeserializeTime", 0) for s in stages
        )
        slow = sorted(
            (
                (
                    round(
                        (s.get("executorRunTime", 0)) / 1000.0, 2
                    ),
                    s.get("stageId"),
                    s.get("numTasks"),
                    (s.get("name") or "")[:60],
                )
                for s in stages
            ),
            reverse=True,
        )[:4]
        row = {
            "query": name,
            "wall": round(wall, 2),
            "build": round(t_build, 2),
            "jobs": len(jobs),
            "stages": len(stages),
            "task_sec": round(tot_task / 1000.0, 1),
            "deser_sec": round(py_t / 1000.0, 1),
            "shuffle_r_mb": round(sh_r / 1e6, 1),
            "shuffle_w_mb": round(sh_w / 1e6, 1),
            "slowest_stages": slow,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n=== by wall ===")
    for r in sorted(rows, key=lambda r: -r["wall"]):
        print(
            f"{r['wall']:7.2f}s build={r['build']:5.2f}s jobs={r['jobs']:3d} "
            f"stages={r['stages']:3d} task={r['task_sec']:7.1f}s "
            f"shW={r['shuffle_w_mb']:8.1f}MB  {r['query']}"
        )


if __name__ == "__main__":
    main()
