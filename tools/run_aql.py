"""CLI entry point — the `analyst run` / `analyst test` / `analyst
validate` analog (cmd/main.go:15-88, cmd/run.go).

Usage:
  python tools/run_aql.py run      script.aql [--params '{"K":"v"}'] [--sf-dir DIR]
  python tools/run_aql.py test     script.aql [--params ...]
  python tools/run_aql.py validate script.aql

`--sf-dir` registers the driver parquet tables as temp views first, so
scripts can `QUERY ... FROM GLOBAL (SELECT ... FROM lineitem ...)`.
Console-destination output goes to stdout (stderr in the reference —
console_dest.go:14; stdout is friendlier to pipes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="run_aql")
    ap.add_argument("mode", choices=["run", "test", "validate"])
    ap.add_argument("script")
    ap.add_argument("--params", default="{}", help="JSON object of options")
    ap.add_argument("--sf-dir", default=None, help="register parquet tables from DIR")
    ap.add_argument("--cpus", default=None)
    args = ap.parse_args(argv)

    with open(args.script) as f:
        text = f.read()
    script_dir = os.path.dirname(os.path.abspath(args.script))
    params = json.loads(args.params)

    if args.mode == "validate":
        from analyst_spark.aql.engine import validate_script

        n = validate_script(text, params or None, script_dir)
        print(f"OK: {n} blocks")
        return 0

    from analyst_spark.aql.engine import execute_script, test_script
    from analyst_spark.session import get_spark
    from analyst_spark.tables import register_views

    spark = get_spark("run_aql", cpus=args.cpus)
    if args.sf_dir:
        register_views(spark, args.sf_dir)

    runner = test_script if args.mode == "test" else execute_script
    res = runner(spark, text, options=params, script_dir=script_dir)
    for line in res.console:
        print(line)
    if args.mode == "test":
        print("TESTS PASSED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
