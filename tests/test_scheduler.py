"""Cron parsing + scheduler catch-up/coalesce semantics
(http/scheduler.go, http/models/task.go)."""

from datetime import datetime, timedelta

import pytest

from analyst_spark.scheduling import Scheduler, Task, parse_cron
from analyst_spark.scheduling.cron import CronError


def _dt(*a):
    return datetime(*a)


# -- cron.next ------------------------------------------------------


def test_every_minute():
    s = parse_cron("0 * * * * *")
    assert s.next(_dt(2026, 1, 1, 10, 0, 0)) == _dt(2026, 1, 1, 10, 1, 0)
    assert s.next(_dt(2026, 1, 1, 10, 0, 30)) == _dt(2026, 1, 1, 10, 1, 0)


def test_strictly_after():
    s = parse_cron("0 0 12 * * *")
    # an activation AT t is not returned — strictly after (robfig Next)
    assert s.next(_dt(2026, 3, 1, 12, 0, 0)) == _dt(2026, 3, 2, 12, 0, 0)


def test_fields_ranges_lists_steps():
    s = parse_cron("0 */15 9-17 * * MON-FRI")
    assert s.next(_dt(2026, 8, 14, 8, 50, 0)) == _dt(2026, 8, 14, 9, 0, 0)  # Friday
    assert s.next(_dt(2026, 8, 14, 9, 0, 0)) == _dt(2026, 8, 14, 9, 15, 0)
    # Friday 17:45 -> Monday 09:00
    assert s.next(_dt(2026, 8, 14, 17, 45, 0)) == _dt(2026, 8, 17, 9, 0, 0)


def test_month_and_name_fields():
    s = parse_cron("0 0 0 1 JAN,JUL *")
    assert s.next(_dt(2026, 2, 1, 0, 0, 0)) == _dt(2026, 7, 1, 0, 0, 0)
    assert s.next(_dt(2026, 7, 1, 0, 0, 0)) == _dt(2027, 1, 1, 0, 0, 0)


def test_dom_dow_either_matches_when_both_restricted():
    # cron convention: both restricted -> OR
    s = parse_cron("0 0 0 13 * FRI")
    # 2026-02-13 is a Friday AND the 13th; 2026-02-06 is an earlier Friday
    assert s.next(_dt(2026, 2, 1, 0, 0, 0)) == _dt(2026, 2, 6, 0, 0, 0)
    # after Fri the 6th, the 13th comes before Fri the 20th
    assert s.next(_dt(2026, 2, 6, 0, 0, 0)) == _dt(2026, 2, 13, 0, 0, 0)


def test_descriptors_and_every():
    assert parse_cron("@daily").next(_dt(2026, 5, 1, 3, 0, 0)) == _dt(2026, 5, 2, 0, 0, 0)
    assert parse_cron("@hourly").next(_dt(2026, 5, 1, 3, 10, 0)) == _dt(2026, 5, 1, 4, 0, 0)
    assert parse_cron("@every 1h30m").next(_dt(2026, 5, 1, 3, 0, 0)) == _dt(2026, 5, 1, 4, 30, 0)


def test_sunday_as_0_and_7():
    assert parse_cron("0 0 0 * * 7").next(_dt(2026, 8, 10, 0, 0, 0)) == _dt(2026, 8, 16, 0, 0, 0)
    assert parse_cron("0 0 0 * * 0").next(_dt(2026, 8, 10, 0, 0, 0)) == _dt(2026, 8, 16, 0, 0, 0)


def test_impossible_spec_returns_none():
    assert parse_cron("0 0 0 30 2 *").next(_dt(2026, 1, 1)) is None


def test_bad_specs_raise():
    for bad in ("* * * * *", "61 * * * * *", "0 * * * * BAD", "@every nope"):
        with pytest.raises(CronError):
            parse_cron(bad)


# -- scheduler ------------------------------------------------------


def _mk(runner=None, t0=_dt(2026, 1, 1, 0, 0, 0)):
    runs = []

    def default_runner(task, args):
        runs.append((task.id, task.next_run, args))
        return "ok"

    clock = lambda: t0
    s = Scheduler(runner=runner or default_runner, clock=clock)
    return s, runs


def test_tick_runs_due_task_and_advances():
    s, runs = _mk()
    t = s.add(Task(id=1, name="t", schedule="0 * * * * *"), now=_dt(2026, 1, 1, 0, 0, 0))
    assert t.next_run == _dt(2026, 1, 1, 0, 1, 0)
    s.tick(_dt(2026, 1, 1, 0, 0, 30))  # not due yet
    assert runs == []
    s.tick(_dt(2026, 1, 1, 0, 1, 30))
    assert [r[1] for r in runs] == [_dt(2026, 1, 1, 0, 1, 0)]
    assert t.next_run == _dt(2026, 1, 1, 0, 2, 0)


def test_catchup_runs_every_missed_activation():
    # downtime across 3 activations -> 3 invocations on next tick
    s, runs = _mk()
    s.add(Task(id=1, name="t", schedule="0 * * * * *"), now=_dt(2026, 1, 1, 0, 0, 0))
    s.tick(_dt(2026, 1, 1, 0, 3, 30))
    assert [r[1] for r in runs] == [
        _dt(2026, 1, 1, 0, 1, 0),
        _dt(2026, 1, 1, 0, 2, 0),
        _dt(2026, 1, 1, 0, 3, 0),
    ]
    assert len(s.invocations) == 3
    assert all(i.success for i in s.invocations)


def test_coalesce_runs_once_after_downtime():
    s, runs = _mk()
    s.add(
        Task(id=1, name="t", schedule="0 * * * * *", coalesce=True),
        now=_dt(2026, 1, 1, 0, 0, 0),
    )
    s.tick(_dt(2026, 1, 1, 0, 3, 30))
    # one invocation (the oldest missed), next_run computed from now
    assert [r[1] for r in runs] == [_dt(2026, 1, 1, 0, 1, 0)]
    assert s.tasks[1].next_run == _dt(2026, 1, 1, 0, 4, 0)


def test_disabled_task_not_run_and_reenable_recomputes():
    s, runs = _mk()
    s.add(Task(id=1, name="t", schedule="0 * * * * *"), now=_dt(2026, 1, 1, 0, 0, 0))
    s.disable(1)
    s.tick(_dt(2026, 1, 1, 0, 5, 0))
    assert runs == []
    s.enable(1, now=_dt(2026, 1, 1, 0, 5, 0))
    assert s.tasks[1].next_run == _dt(2026, 1, 1, 0, 6, 0)


def test_failed_invocation_records_error_and_advances():
    def boom(task, args):
        raise RuntimeError("job failed")

    s, _ = _mk(runner=boom)
    s.add(Task(id=1, name="t", schedule="0 * * * * *"), now=_dt(2026, 1, 1, 0, 0, 0))
    s.tick(_dt(2026, 1, 1, 0, 1, 30))
    (inv,) = s.invocations
    assert not inv.success and inv.error_message == "job failed"
    assert s.tasks[1].next_run == _dt(2026, 1, 1, 0, 2, 0)  # still advances


def test_arg_template_renders_task_start_time():
    s, runs = _mk()
    s.add(
        Task(id=1, name="t", schedule="0 * * * * *",
             arguments="Start={{ .TaskStartTime }}"),
        now=_dt(2026, 1, 1, 0, 0, 0),
    )
    s.tick(_dt(2026, 1, 1, 0, 1, 30))
    assert runs[0][2] == "Start=2026-01-01T00:01:00"


def test_repair_recomputes_from_last_invocation():
    s, runs = _mk()
    s.add(Task(id=1, name="a", schedule="0 0 * * * *"), now=_dt(2026, 1, 1, 0, 0, 0))
    s.add(Task(id=2, name="b", schedule="0 0 * * * *"), now=_dt(2026, 1, 1, 0, 0, 0))
    s.tick(_dt(2026, 1, 1, 1, 0, 30))  # task 1+2 run the 01:00 slot
    # corrupt next_run
    s.tasks[1].next_run = None
    s.tasks[2].next_run = _dt(1999, 1, 1)
    s.repair(now=_dt(2026, 1, 1, 1, 30, 0))
    # recomputed from last scheduled_at (01:00) -> 02:00
    assert s.tasks[1].next_run == _dt(2026, 1, 1, 2, 0, 0)
    assert s.tasks[2].next_run == _dt(2026, 1, 1, 2, 0, 0)


def test_scheduler_drives_aql_script(spark):
    # end-to-end: the runner executes an AQL script with the rendered
    # params, like `analyst run --script job.aql --params ...`
    from analyst_spark.aql.engine import execute_script

    outputs = []

    def aql_runner(task, args):
        res = execute_script(
            spark, task.command, options={"Label": args or "none"}
        )
        outputs.append(res.globals.get("out").collect())
        return "rows=%d" % len(outputs[-1])

    script = """
    DATA 'D' (
        [[1], [2]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'k')
    INTO GLOBAL WITH (Table = 'out')
    """
    s = Scheduler(runner=aql_runner, clock=lambda: _dt(2026, 1, 1))
    s.add(Task(id=1, name="job", schedule="0 * * * * *", command=script),
          now=_dt(2026, 1, 1, 0, 0, 0))
    s.tick(_dt(2026, 1, 1, 0, 1, 30))
    assert len(outputs) == 1 and len(outputs[0]) == 2
    assert s.invocations[0].success and s.invocations[0].log == "rows=2"


def test_next_from_leap_day_does_not_raise():
    # year+5 via replace() lands on a nonexistent Feb 29 and raised
    # ValueError; the horizon must be computed with timedelta
    s = parse_cron("0 0 0 1 1 *")
    assert s.next(_dt(2028, 2, 29, 12, 0, 0)) == _dt(2029, 1, 1)
