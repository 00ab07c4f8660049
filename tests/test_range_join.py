"""Bucketized range join: window boundaries ((t-w, t]), bin-edge
crossings, per-key isolation, zero-match left rows."""

from datetime import datetime

from analyst_spark.operators.range_join import range_count_join


def _t(s):
    return datetime(2024, 1, 1, 10, s // 60, s % 60)


def test_range_count_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, "u1", _t(600)), (2, "u2", _t(600)), (3, "u1", _t(2000))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _t(600)),   # == left ts -> counts (inclusive upper)
            ("u1", _t(301)),   # just inside the 300s window
            ("u1", _t(300)),   # exactly t-w -> excluded (strict lower)
            ("u1", _t(599)),   # inside, crosses a bin edge from left
            ("u2", _t(550)),   # other key
        ],
        "k string, ts timestamp",
    )
    out = {
        r.lid: r.n_in_range
        for r in range_count_join(
            left, right, ["k"], window_s=300
        ).collect()
    }
    assert out == {1: 3, 2: 1, 3: 0}
