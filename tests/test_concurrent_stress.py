"""Randomized concurrent-job stress on ONE SparkSession (VERDICT r7
#7): N threads run seeded random AQL jobs that deliberately OVERLAP
on every piece of session-shared state — the same block aliases, the
same GLOBAL table names (with multi-writer INTO GLOBAL appends inside
a job), parameter tables bound via USING PARAMETER, and interleaved
test-mode runs — and every job's results must equal its own serial
run. Extends test_concurrent_jobs.py's single hand-built collision
to a generated sweep."""

from __future__ import annotations

import random
import threading

import pytest

# alias: engine.test_script would otherwise be COLLECTED by pytest
from analyst_spark.aql.engine import execute_script
from analyst_spark.aql.engine import test_script as run_test_mode


def _make_script(rng: random.Random, tag: int) -> tuple[str, dict]:
    """A seeded random job script + its expected outputs (computed
    in Python — the model). Every job uses the SAME aliases: Vals,
    Out, AggOut, g, @Thr."""
    n_rows = rng.randint(2, 6)
    vals = [tag * 100 + i for i in range(n_rows)]
    thr = tag * 100 + rng.randint(0, n_rows - 1)
    g_vals = [tag * 1000 + i for i in range(rng.randint(1, 3))]
    append_g = rng.random() < 0.5

    rows_json = ", ".join(f"[{v}]" for v in vals)
    g_inserts = "\n        ".join(
        f"INSERT INTO g (x) VALUES ({v});" for v in g_vals
    )
    parts = [
        f"""
    GLOBAL 'Init' (
        CREATE TABLE g ( x Number );
        {g_inserts}
    )
    DATA 'Vals' (
        [{rows_json}]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'n')

    DECLARE @Thr;
    QUERY 'GetThr' FROM GLOBAL (
        SELECT {thr} AS t
    ) INTO PARAMETER (@Thr);

    QUERY 'Filt' FROM BLOCK Vals (
        SELECT n FROM vals WHERE n > ?
    ) USING PARAMETER @Thr
    INTO GLOBAL WITH (Table = 'Out')
    AFTER GetThr
    """
    ]
    expected_out = [v for v in vals if v > thr]
    if append_g:
        parts.append(
            """
    QUERY 'More' FROM GLOBAL (
        SELECT x AS n FROM g
    ) INTO GLOBAL WITH (Table = 'Out') AFTER Filt
    """
        )
        expected_out = expected_out + g_vals
    parts.append(
        """
    TRANSFORM 'Agg' FROM BLOCK Vals (
        AGGREGATE SUM(n) AS total, COUNT(n) AS cnt
    ) INTO GLOBAL WITH (Table = 'AggOut')
    """
    )
    expected = {
        "out": sorted(expected_out),
        "aggout": (float(sum(vals)), float(len(vals))),
    }
    return "\n".join(parts), expected


def _test_mode_script(tag: int) -> str:
    # the assertion fails iff this job sees another job's rows (all
    # our n values share the tag*100 prefix and are unique)
    return f"""
    DATA 'Vals' (
        [[{tag * 100 + 1}], [{tag * 100 + 2}]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'n')
    INTO CONSOLE

    TEST Vals WITH ASSERTIONS (
        COLUMN n HAS UNIQUE VALUES;
        IT SATISFIES n > {tag * 100} AND n < {tag * 100 + 50}
    )
    """


def _run_job(spark, rng: random.Random, tag: int, iteration: int):
    script, expected = _make_script(
        random.Random(rng.randint(0, 1 << 30)), tag
    )
    res = execute_script(spark, script)
    got_out = sorted(int(r.n) for r in res.globals.get("out").collect())
    agg = res.globals.get("aggout").collect()[0]
    assert got_out == expected["out"], (
        f"job {tag} iter {iteration}: Out={got_out} "
        f"expected {expected['out']}"
    )
    assert (agg.total, agg.cnt) == expected["aggout"], (
        f"job {tag} iter {iteration}: Agg={agg} expected {expected['aggout']}"
    )


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_randomized_concurrent_jobs(spark, seed):
    tags = [3, 5, 7, 11, 13, 17]
    errors: list[Exception] = []
    barrier = threading.Barrier(len(tags))

    def run(tag: int):
        rng = random.Random(seed * 1000 + tag)
        try:
            barrier.wait(timeout=120)
            for it in range(3):
                if rng.random() < 0.25:
                    # interleave a test-mode run (neutralized sinks,
                    # enforced assertions) on the same aliases
                    run_test_mode(spark, _test_mode_script(tag))
                _run_job(spark, rng, tag, it)
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=run, args=(t,)) for t in tags]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not any(t.is_alive() for t in threads), "stress threads hung"
    assert not errors, errors[0]


def test_serial_equals_model(spark):
    """The generator's Python-side expected values are themselves
    checked against serial execution for a spread of seeds — so the
    concurrent sweep above compares against a verified model."""
    for seed in range(8):
        rng = random.Random(seed)
        script, expected = _make_script(rng, tag=9)
        res = execute_script(spark, script)
        got = sorted(int(r.n) for r in res.globals.get("out").collect())
        agg = res.globals.get("aggout").collect()[0]
        assert got == expected["out"], f"seed {seed}"
        assert (agg.total, agg.cnt) == expected["aggout"], f"seed {seed}"
