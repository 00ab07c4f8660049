"""End-of-round preflight gate (VERDICT r13 #3).

Two rounds in a row shipped a defect in the final hours because the
round's OWN fences were not re-run after the last catalog-touching
commit (r12: an unbounded stream-stream join; r13: a quadratic gram
pass + a stale VERIFY artifact). This tool mechanizes the checklist
so the round's HEAD carries a committed log proving the fences ran
LAST:

1. **artifact freshness** — the newest committed VERIFY_LOCAL_r{N}
   (and its _SF0.1 twin) must cover EXACTLY the catalog registry;
2. **adversarial sweeps** — pathological/empty/null corpora for every
   entry TOUCHED since the baseline artifact (registry minus the
   PREVIOUS round's artifact keys, plus any ``--entries`` the round
   modified in place);
3. **state fence** — tests/test_streaming_state.py replays every
   streaming entry and asserts its executed stateful operators match
   the declared contract;
4. **entry contract** — the full tests/test_entry_contract.py module
   (registry/oracle/artifact invariants).

Usage::

    python tools/preflight.py [--entries a,b,c] [--baseline FILE]

Exit 0 = all green. Output is written to PREFLIGHT.log at the repo
root — commit it as (part of) the round's last commit. The log
records the touched-entry list so the judge can check it includes
every entry added/modified in the round.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _latest_artifacts() -> list[tuple[int, str]]:
    return sorted(
        (int(m.group(1)), fn)
        for fn in os.listdir(ROOT)
        if (m := re.fullmatch(r"VERIFY_LOCAL_r(\d+)\.json", fn))
    )


def _artifact_keys(path: str) -> set[str]:
    with open(path) as f:
        return set(json.load(f)["queries"])


def main() -> int:
    argv = sys.argv[1:]
    extra: list[str] = []
    baseline = None
    if "--entries" in argv:
        i = argv.index("--entries")
        extra = [e for e in argv[i + 1].split(",") if e]
        argv = argv[:i] + argv[i + 2 :]
    if "--baseline" in argv:
        i = argv.index("--baseline")
        baseline = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]

    from analyst_spark.plans.catalog import QUERIES

    registry = set(QUERIES)
    arts = _latest_artifacts()
    lines: list[str] = [
        f"preflight @ {time.strftime('%Y-%m-%d %H:%M:%S')}",
        f"registry entries: {len(registry)}",
    ]
    ok = True

    # 1. freshness: newest artifact (+ SF0.1 twin) == registry
    if not arts:
        lines.append("FAIL freshness: no VERIFY_LOCAL artifact")
        ok = False
    else:
        latest_n, latest_fn = arts[-1]
        for fn in (latest_fn, latest_fn.replace(".json", "_SF0.1.json")):
            p = os.path.join(ROOT, fn)
            if not os.path.exists(p):
                lines.append(f"FAIL freshness: {fn} missing")
                ok = False
                continue
            got = _artifact_keys(p)
            if got == registry:
                lines.append(f"ok   freshness: {fn} covers {len(got)}")
            else:
                lines.append(
                    f"FAIL freshness: {fn} missing="
                    f"{sorted(registry - got)} stale={sorted(got - registry)}"
                )
                ok = False

    # 2. touched entries = registry - baseline artifact keys + --entries
    if baseline is None and len(arts) >= 2:
        baseline = os.path.join(ROOT, arts[-2][1])
    elif baseline is None and arts:
        baseline = os.path.join(ROOT, arts[-1][1])
    base_keys = _artifact_keys(baseline) if baseline else set()
    touched = sorted((registry - base_keys) | set(extra))
    lines.append(
        f"baseline: {os.path.basename(baseline) if baseline else '-'}; "
        f"touched entries: {touched}"
    )

    def run(label: str, cmd: list[str]) -> None:
        nonlocal ok
        t0 = time.time()
        r = subprocess.run(
            cmd, cwd=ROOT, capture_output=True, text=True, timeout=3600
        )
        tail = (r.stdout + r.stderr).strip().splitlines()[-1:]
        status = "ok  " if r.returncode == 0 else "FAIL"
        if r.returncode != 0:
            ok = False
        lines.append(
            f"{status} {label} [{time.time() - t0:.0f}s] "
            f"{tail[0] if tail else ''}"
        )
        print(lines[-1], flush=True)

    py = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider"]
    if touched:
        sweep_k = " or ".join(f"({e})" for e in touched)
        run(
            "sweeps(touched)",
            py
            + [
                "tests/test_pathological_text.py",
                "tests/test_empty_corpus.py",
                "tests/test_null_corpus.py",
                "-k",
                sweep_k,
            ],
        )
    else:
        lines.append("ok   sweeps(touched): nothing touched")
    run("state fence", py + ["tests/test_streaming_state.py"])
    run("entry contract", py + ["tests/test_entry_contract.py"])

    lines.append("PREFLIGHT " + ("GREEN" if ok else "RED"))
    with open(os.path.join(ROOT, "PREFLIGHT.log"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
