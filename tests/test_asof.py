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


def test_asof_tie_break_whole_row_not_mixed(spark):
    # ADVICE r1: two right rows tied on (key, ts) must contribute ONE
    # whole row, never col A from one and col B from the other.
    left = spark.createDataFrame(
        [(1, "u1", _ts(10))], "lid long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts(10), 1, 900), ("u1", _ts(10), 2, 100)],
        "k string, ts timestamp, v1 long, v2 long",
    )
    (row,) = asof_join(left, right, "ts", ["k"], ["v1", "v2"]).collect()
    # greatest (v1, v2) struct is (2, 100); a per-column fill would
    # have produced the mixed (2, 900)
    assert (row.v1_asof, row.v2_asof) == (2, 100)
