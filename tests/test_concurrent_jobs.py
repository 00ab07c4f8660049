"""Concurrent-job isolation on ONE SparkSession (the HTTP server runs
jobs in threads): temp views are session-global, so two jobs staging
the same block alias or GLOBAL table name could clobber each other —
the reference never shares this state (fresh SQLite per AutoSQL
transform; server jobs are separate subprocesses). The engine
serializes every register-view → spark.sql window under
globals_store.VIEW_LOCK (eager analysis binds each DataFrame to the
view's plan at call time), so same-named staging in concurrent jobs
must stay fully isolated."""

import threading

from analyst_spark.aql.engine import execute_script


def _job_script(tag: int) -> str:
    # every job uses the SAME block alias and GLOBAL table names
    return f"""
    DATA 'Vals' (
        [[{tag}], [{tag}], [{tag}]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'n')

    QUERY 'Agg' FROM BLOCK Vals (
        SELECT sum(n) AS total, count(n) AS cnt FROM vals
    ) INTO GLOBAL WITH (Table = 'Out')

    QUERY 'Echo' FROM GLOBAL (
        SELECT total, cnt FROM out
    ) INTO GLOBAL WITH (Table = 'Final')
    """


def test_concurrent_jobs_same_alias_stay_isolated(spark):
    results: dict[int, tuple] = {}
    errors: list[Exception] = []
    barrier = threading.Barrier(4)

    def run(tag: int):
        try:
            barrier.wait(timeout=60)
            for _ in range(3):  # repeat to widen the collision window
                res = execute_script(spark, _job_script(tag))
                row = res.globals.get("final").collect()[0]
                results[tag] = (row.total, row.cnt)
                assert (row.total, row.cnt) == (3 * tag, 3), (
                    f"job {tag} saw another job's data: {row}"
                )
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [
        threading.Thread(target=run, args=(tag,)) for tag in (7, 11, 13, 17)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors[0]
    assert results == {7: (21, 3), 11: (33, 3), 13: (39, 3), 17: (51, 3)}
