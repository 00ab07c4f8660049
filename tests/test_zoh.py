"""ZOH time-weighted mean vs the reference's hand-computed fixtures
(transforms/timeseries_test.go:10-98 series shapes, zoh_test.go)."""

import datetime as dt

import pytest

from analyst_spark.operators.zoh import zoh_mean


def _epoch(s):
    return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=s)


SERIES = {
    "single": [(0, 1.0)],
    "outside_interval": [(1, 1.0), (10, 0.0)],
    "one_inside": [(0, 1.0), (2, 3.0), (10, 4.0)],
    "two_inside": [(0, 1.0), (1, 2.0), (2, 3.0), (10, 4.0)],
    "all_inside_but_one": [(0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0)],
}

# Interval [1, 5]; expectations from timeseries_test.go:79-86.
EXPECTED = {
    "single": 1.0,
    "outside_interval": 1.0,
    "one_inside": (1 / 4) * 1 + (3 / 4) * 3,
    "two_inside": (1 / 4) * 2 + (3 / 4) * 3,
    "all_inside_but_one": (1 / 4) * 2 + (1 / 4) * 3 + (2 / 4) * 4,
}


def _run(spark, rows, start_s, finish_s):
    df = spark.createDataFrame(
        [("g", _epoch(t), v) for t, v in rows], ["g", "t", "v"]
    )
    start = _epoch(start_s).strftime("%Y-%m-%d %H:%M:%S")
    finish = _epoch(finish_s).strftime("%Y-%m-%d %H:%M:%S")
    out = zoh_mean(df, ["g"], "t", "v", start, finish, alias="m").collect()
    assert len(out) == 1
    return out[0].m


@pytest.mark.parametrize("name", list(SERIES))
def test_reference_series(spark, name):
    got = _run(spark, SERIES[name], 1, 5)
    assert got == pytest.approx(EXPECTED[name], abs=1e-9)


def test_zoh_rfc3339_strings(spark):
    # zoh_test.go: [(12:00, 0), (12:20, 3)] over [12:00, 12:30] -> 1.0
    df = spark.createDataFrame(
        [
            ("g", "2017-01-01T12:00:00Z", 0.0),
            ("g", "2017-01-01T12:20:00Z", 3.0),
        ],
        ["g", "t", "v"],
    )
    out = zoh_mean(
        df, ["g"], "t", "v", "2017-01-01T12:00:00Z", "2017-01-01T12:30:00Z"
    ).collect()
    assert out[0].zoh == pytest.approx(1.0)


def test_null_when_series_starts_late(spark):
    # zoh.go:180-182: first point after `start` -> NULL
    got = _run(spark, [(3, 1.0), (4, 2.0)], 1, 5)
    assert got is None


def test_null_when_empty_interval(spark):
    # zoh.go:177-179: finish <= start -> NULL
    got = _run(spark, [(0, 1.0), (2, 2.0)], 5, 5)
    assert got is None


def test_multiple_groups_independent(spark):
    df = spark.createDataFrame(
        [("a", _epoch(0), 2.0), ("b", _epoch(0), 4.0), ("b", _epoch(3), 8.0)],
        ["g", "t", "v"],
    )
    out = {
        r.g: r.m
        for r in zoh_mean(
            df, ["g"], "t", "v", "1970-01-01 00:00:01", "1970-01-01 00:00:05", alias="m"
        ).collect()
    }
    assert out["a"] == pytest.approx(2.0)
    assert out["b"] == pytest.approx((2 / 4) * 4 + (2 / 4) * 8)
