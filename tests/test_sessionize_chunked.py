"""Chunked (hot-key-safe) sessionization equals the plain window
exactly — randomized property sweep + hand-built boundary cases +
the hot-threshold routing path (VERDICT r7 #3)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest

from analyst_spark.operators.sessionize import (
    _plain_sessions,
    sessionize_chunked,
)

BASE = datetime(2024, 1, 1)


def _frame(spark, rows):
    # rows: (user_id, offset_seconds, event_id)
    data = [
        (u, BASE + timedelta(seconds=off), e) for u, off, e in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long"
    )


def _collect(df):
    return sorted(
        (r.user_id, r.n_sessions, r.max_session_events)
        for r in df.collect()
    )


def _assert_equal(spark, rows, slice_s, hot_threshold=None):
    ev = _frame(spark, rows)
    plain = _collect(
        _plain_sessions(ev, "user_id", "ts", "event_id", 1800)
    )
    chunk = _collect(
        sessionize_chunked(
            ev, gap_s=1800, slice_s=slice_s, hot_threshold=hot_threshold
        )
    )
    assert chunk == plain, f"slice_s={slice_s} rows={rows[:20]}..."


def test_session_spans_many_slices(spark):
    # one session whose events cross 5 slice boundaries: every
    # boundary must merge, chaining through single-session slices
    rows = [(1, i * 1000, i) for i in range(20)]  # gaps 1000 <= 1800
    _assert_equal(spark, rows, slice_s=3600)


def test_split_exactly_at_boundary_gap(spark):
    # gap exactly 1800 continues the session; 1801 splits — on both
    # sides of a slice edge
    rows = [(1, 0, 0), (1, 1800, 1), (1, 3601, 2), (1, 5401, 3)]
    _assert_equal(spark, rows, slice_s=2000)
    _assert_equal(spark, rows, slice_s=1800)


def test_multi_session_slice_endpoints(spark):
    # slice with 3 local sessions: first merges backward, last
    # merges forward, middle stands alone
    rows = [
        (1, 0, 0),            # slice 0, session A
        (1, 3600, 1),         # slice 1 first (gap 3600: new session B)... merges? no
        (1, 3700, 2),         # still B
        (1, 7000, 3),         # slice 1, session C (gap 3300)
        (1, 10400, 4),        # slice 2? depends on slicing; session D
        (1, 10500, 5),
    ]
    for slice_s in (3500, 5000, 7200, 100000):
        _assert_equal(spark, rows, slice_s=slice_s)


def test_empty_and_single_event_users(spark):
    rows = [(1, 0, 0), (2, 50, 1), (2, 5000, 2)]
    _assert_equal(spark, rows, slice_s=1000)


@pytest.mark.parametrize("seed", range(12))
def test_random_equivalence(spark, seed):
    rng = random.Random(seed)
    rows = []
    eid = 0
    for u in range(rng.randint(1, 5)):
        t = rng.randint(0, 5000)
        for _ in range(rng.randint(1, 60)):
            rows.append((u, t, eid))
            eid += 1
            # mix of intra-session gaps, exact-boundary gaps, splits
            t += rng.choice([1, 300, 1700, 1800, 1801, 4000, 90000])
    slice_s = rng.choice([900, 1800, 3600, 86400])
    _assert_equal(spark, rows, slice_s=slice_s)


def test_hot_threshold_routing(spark):
    # user 1 is hot (80 events), users 2/3 are not; the routed result
    # must equal the plain window over everyone
    rng = random.Random(7)
    rows = []
    eid = 0
    t = 0
    for _ in range(80):
        rows.append((1, t, eid)); eid += 1
        t += rng.choice([600, 2000])
    for u in (2, 3):
        t = 0
        for _ in range(5):
            rows.append((u, t, eid)); eid += 1
            t += rng.choice([600, 2000])
    _assert_equal(spark, rows, slice_s=3600, hot_threshold=20)
    # degenerate thresholds: everyone hot / nobody hot
    _assert_equal(spark, rows, slice_s=3600, hot_threshold=0)
    _assert_equal(spark, rows, slice_s=3600, hot_threshold=10_000)


def test_ties_same_timestamp(spark):
    # simultaneous events order by event_id; all within one session
    rows = [(1, 0, 3), (1, 0, 1), (1, 0, 2), (1, 100, 4)]
    _assert_equal(spark, rows, slice_s=50)
