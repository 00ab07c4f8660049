"""Cron expression parser + next-activation computation.

Compatible with the grammar the reference consumes through
robfig/cron v1 (http/models/task.go:35 ``cron.Parse``): SIX fields
``second minute hour day-of-month month day-of-week``, with ``*``,
``?``, lists, ranges, steps, month/day names, the ``@yearly`` …
``@hourly`` descriptors, and ``@every <duration>``.

``next(t)`` returns the first activation STRICTLY AFTER ``t``
(robfig's ``Schedule.Next`` contract) — callers that need
"at-or-after s" pass ``s - 1ns``-style adjustments exactly like the
reference's ``NextInvocation(lastRun + time.Nanosecond)``.

Day-of-month/day-of-week interaction follows cron convention (and
robfig): when BOTH fields are restricted, a day matches if EITHER
matches; otherwise both must match (trivially true for the
unrestricted one).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timedelta

_MONTHS = {m: i + 1 for i, m in enumerate(
    "JAN FEB MAR APR MAY JUN JUL AUG SEP OCT NOV DEC".split()
)}
_DOWS = {d: i for i, d in enumerate("SUN MON TUE WED THU FRI SAT".split())}

_DESCRIPTORS = {
    "@yearly": "0 0 0 1 1 *",
    "@annually": "0 0 0 1 1 *",
    "@monthly": "0 0 0 1 * *",
    "@weekly": "0 0 0 * * 0",
    "@daily": "0 0 0 * * *",
    "@midnight": "0 0 0 * * *",
    "@hourly": "0 0 * * * *",
}

_EVERY_RE = re.compile(r"@every\s+(.+)")
_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)(h|m|s|ms)")

# search horizon: a spec that never matches (e.g. Feb 30) must fail
# finitely, robfig uses the same 5-year limit
_YEAR_LIMIT = 5


class CronError(ValueError):
    pass


def _parse_duration(s: str) -> timedelta:
    total = 0.0
    pos = 0
    for m in _DUR_RE.finditer(s):
        if m.start() != pos:
            raise CronError(f"bad duration {s!r}")
        n = float(m.group(1))
        total += n * {"h": 3600, "m": 60, "s": 1, "ms": 0.001}[m.group(2)]
        pos = m.end()
    if pos != len(s.strip()) or total <= 0:
        raise CronError(f"bad duration {s!r}")
    return timedelta(seconds=total)


def _parse_field(expr: str, lo: int, hi: int, names: dict[str, int] | None):
    """Returns (allowed_values: frozenset[int], restricted: bool)."""
    allowed: set[int] = set()
    restricted = True
    for part in expr.split(","):
        part = part.strip()
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            if not step_s.isdigit() or int(step_s) < 1:
                raise CronError(f"bad step in {expr!r}")
            step = int(step_s)
            star_step = part in ("*", "?")
        else:
            star_step = False
        def resolve(tok: str) -> int:
            tok = tok.strip()
            if names and tok.upper() in names:
                return names[tok.upper()]
            if not re.fullmatch(r"\d+", tok):
                raise CronError(f"bad value {tok!r} in {expr!r}")
            return int(tok)
        if part in ("*", "?"):
            a, b = lo, hi
            if step == 1 and not star_step:
                restricted = False
            elif step == 1:
                restricted = False
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = resolve(a_s), resolve(b_s)
        else:
            a = resolve(part)
            # "n/step" means n..hi by step (robfig); bare "n" is just n
            b = hi if step > 1 else a
        if not (lo <= a <= hi and lo <= b <= hi and a <= b):
            raise CronError(f"value out of range [{lo},{hi}] in {expr!r}")
        allowed.update(range(a, b + 1, step))
    return frozenset(allowed), restricted


@dataclass(frozen=True)
class CronSchedule:
    seconds: frozenset
    minutes: frozenset
    hours: frozenset
    doms: frozenset
    months: frozenset
    dows: frozenset
    dom_restricted: bool
    dow_restricted: bool

    def _day_matches(self, t: datetime) -> bool:
        dom_ok = t.day in self.doms
        dow_ok = ((t.weekday() + 1) % 7) in self.dows  # python Mon=0 -> cron Sun=0
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok
        return dom_ok and dow_ok

    def next(self, t: datetime) -> datetime | None:
        """First activation strictly after ``t`` (second resolution),
        or None if none within the search horizon."""
        t = t.replace(microsecond=0) + timedelta(seconds=1)
        # timedelta, not t.replace(year=...): replace raises on Feb 29
        # of a leap year (+5y lands on a nonexistent date)
        limit = t + timedelta(days=365 * _YEAR_LIMIT + 2)
        while t < limit:
            if t.month not in self.months:
                # first instant of next month
                t = (t.replace(day=1, hour=0, minute=0, second=0)
                     + timedelta(days=32)).replace(day=1, hour=0, minute=0, second=0)
                continue
            if not self._day_matches(t):
                t = (t + timedelta(days=1)).replace(hour=0, minute=0, second=0)
                continue
            if t.hour not in self.hours:
                t = (t + timedelta(hours=1)).replace(minute=0, second=0)
                continue
            if t.minute not in self.minutes:
                t = (t + timedelta(minutes=1)).replace(second=0)
                continue
            if t.second not in self.seconds:
                t = t + timedelta(seconds=1)
                continue
            return t
        return None


@dataclass(frozen=True)
class EverySchedule:
    delay: timedelta

    def next(self, t: datetime) -> datetime:
        # robfig ConstantDelaySchedule: t + delay, rounded down to the
        # second
        return (t + self.delay).replace(microsecond=0)


def parse_cron(spec: str):
    """Parse a 6-field cron spec / descriptor into a schedule object
    exposing ``next(datetime) -> datetime | None``."""
    spec = spec.strip()
    m = _EVERY_RE.fullmatch(spec)
    if m:
        return EverySchedule(_parse_duration(m.group(1)))
    if spec in _DESCRIPTORS:
        spec = _DESCRIPTORS[spec]
    fields = spec.split()
    if len(fields) != 6:
        raise CronError(
            f"expected 6 fields (sec min hour dom month dow), got {len(fields)}"
        )
    seconds, _ = _parse_field(fields[0], 0, 59, None)
    minutes, _ = _parse_field(fields[1], 0, 59, None)
    hours, _ = _parse_field(fields[2], 0, 23, None)
    doms, dom_r = _parse_field(fields[3], 1, 31, None)
    months, _ = _parse_field(fields[4], 1, 12, _MONTHS)
    dows, dow_r = _parse_field(fields[5], 0, 7, _DOWS)
    if 7 in dows:  # both 0 and 7 mean Sunday
        dows = frozenset(dows | {0})
    return CronSchedule(
        seconds, minutes, hours, doms, months, dows, dom_r, dow_r
    )
