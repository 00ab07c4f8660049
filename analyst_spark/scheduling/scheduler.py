"""Task scheduler with the reference's catch-up and coalesce
semantics (http/scheduler.go).

* ``tick(now)`` ≙ ``Scheduler.Next(now)`` (scheduler.go:87-114): run
  every enabled task whose ``next_run`` is due. Invocations run
  synchronously here (deterministic; the reference's goroutine fan-out
  is a web-server concern, not a semantic one).
* catch-up loop (scheduler.go:144-164): while ``next_run`` is before
  ``now``, run one invocation per missed activation, re-checking
  ``enabled`` between activations; a COALESCED task advances
  ``next_run`` from ``now`` so the loop body runs at most once.
* ``updateNextRun`` (scheduler.go:243-258): coalesce → next
  activation after ``now``; otherwise → next activation strictly
  after the missed ``next_run`` (the reference's ``+1ns``).
* ``repair(now)`` (scheduler.go:43-85): recompute every enabled
  task's ``next_run`` from its latest invocation's scheduled time
  (or ``now`` when it never ran).
* invocation records carry scheduled_at/start/finish/success/
  error_message/log (http/models, endInvocation scheduler.go:259-275)
  and arguments render ``{{ .TaskStartTime }}``
  (executeArgTemplate, scheduler.go:228-242).

The runner is injected: ``runner(task, args) -> str`` returns the
invocation log and signals failure by raising. Wire it to
``analyst_spark.aql.engine.execute_script`` to schedule AQL jobs —
the reference shells out to ``analyst run --script …`` the same way.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable

from analyst_spark.scheduling.cron import parse_cron


@dataclass
class Task:
    id: int
    name: str
    schedule: str
    command: str = ""
    arguments: str = ""
    enabled: bool = True
    coalesce: bool = False
    next_run: datetime | None = None

    def next_invocation(self, after: datetime) -> datetime | None:
        return parse_cron(self.schedule).next(after)


@dataclass
class Invocation:
    task_id: int
    scheduled_at: datetime
    start: datetime
    finish: datetime | None = None
    success: bool = False
    error_message: str = ""
    log: str = ""


@dataclass
class Scheduler:
    runner: Callable[[Task, str], str]
    clock: Callable[[], datetime] = datetime.now
    tasks: dict[int, Task] = field(default_factory=dict)
    invocations: list[Invocation] = field(default_factory=list)

    def add(self, task: Task, now: datetime | None = None) -> Task:
        now = now or self.clock()
        if task.next_run is None:
            task.next_run = task.next_invocation(now)
        self.tasks[task.id] = task
        return task

    def enable(self, task_id: int, now: datetime | None = None) -> None:
        t = self.tasks[task_id]
        t.enabled = True
        t.next_run = t.next_invocation(now or self.clock())

    def disable(self, task_id: int) -> None:
        self.tasks[task_id].enabled = False

    # -- scheduler.go:87-114 -----------------------------------------

    def tick(self, now: datetime | None = None) -> list[Task]:
        """Run every due task; returns the enabled tasks examined."""
        now = now or self.clock()
        due = [
            t for t in self.tasks.values()
            if t.enabled and t.next_run is not None
        ]
        for t in due:
            if t.next_run > now:
                continue
            self._execute(t, now)
        return due

    # -- scheduler.go:116-169 ----------------------------------------

    def _execute(self, task: Task, now: datetime) -> None:
        # catch-up loop: one invocation per missed activation; for
        # coalesced tasks this runs at most once because the next run
        # is computed from `now`
        while task.next_run is not None and task.next_run < now:
            if not self.tasks[task.id].enabled:  # re-check, like the DB read
                break
            self._run_single(task, now)
            self._update_next_run(task, now)

    def _run_single(self, task: Task, now: datetime) -> None:
        inv = Invocation(
            task_id=task.id,
            scheduled_at=task.next_run,
            start=self.clock(),
        )
        self.invocations.append(inv)
        args = self._render_args(task)
        try:
            inv.log = self.runner(task, args) or ""
            inv.success = True
        except Exception as e:  # endInvocation with error
            inv.error_message = str(e)
        inv.finish = self.clock()

    # -- scheduler.go:228-242 ----------------------------------------

    def _render_args(self, task: Task) -> str:
        return task.arguments.replace(
            "{{ .TaskStartTime }}",
            task.next_run.isoformat() if task.next_run else "",
        ).replace(
            "{{.TaskStartTime}}",
            task.next_run.isoformat() if task.next_run else "",
        )

    # -- scheduler.go:243-258 ----------------------------------------

    def _update_next_run(self, task: Task, now: datetime) -> None:
        if task.coalesce:
            task.next_run = task.next_invocation(now)
        else:
            # strictly after the missed activation (the +1ns)
            task.next_run = task.next_invocation(task.next_run)

    # -- scheduler.go:43-85 ------------------------------------------

    def repair(self, now: datetime | None = None) -> list[Task]:
        """Recompute next_run for all enabled tasks from their latest
        invocation (or from now if never invoked)."""
        now = now or self.clock()
        last_run: dict[int, datetime] = {}
        for inv in self.invocations:
            cur = last_run.get(inv.task_id)
            if cur is None or inv.scheduled_at > cur:
                last_run[inv.task_id] = inv.scheduled_at
        out = []
        for t in self.tasks.values():
            if not t.enabled:
                continue
            base = last_run.get(t.id, now)
            t.next_run = t.next_invocation(base)
            out.append(t)
        return out
