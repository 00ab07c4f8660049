"""As-of join operator: backward match, <= tie semantics, unmatched
left rows, per-key isolation, deterministic tie-break among right
rows at equal ts."""

from datetime import datetime

from analyst_spark.operators.asof import asof_join


def _ts(m):
    return datetime(2024, 1, 1, 10, m)


def test_asof_backward_join(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(5)), (2, "u1", _ts(20)), (3, "u2", _ts(10)),
         (4, "u3", _ts(30))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(0), 100), ("u1", _ts(20), 200),  # == left ts → matches
         ("u2", _ts(15), 300)],                       # after left → no match
        "k string, ts timestamp, v long",
    )
    out = {r.lid: r.v_asof for r in
           asof_join(left, right, "ts", ["k"], ["v"]).collect()}
    assert out == {1: 100, 2: 200, 3: None, 4: None}


def test_asof_tie_break_greatest_value(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10))], "lid long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts(10), 7), ("u1", _ts(10), 9)],
        "k string, ts timestamp, v long",
    )
    (row,) = asof_join(left, right, "ts", ["k"], ["v"]).collect()
    assert row.v_asof == 9  # greatest value tuple wins deterministically
