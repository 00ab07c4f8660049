"""APPLY/CAST matrix tests per transforms/cast.go + cast_test.go."""

import datetime as dt

from analyst_spark.operators.apply import apply_cast


def test_cast_int_from_various(spark):
    df = spark.createDataFrame(
        [(1.9, "42", True, dt.datetime(1970, 1, 1, 0, 1, 40))],
        ["f", "s", "b", "t"],
    )
    out = apply_cast(
        df,
        [("f", "int", "fi"), ("s", "int", "si"), ("b", "int", "bi"), ("t", "int", "ti")],
    ).collect()[0]
    assert out.fi == 1      # float truncates
    assert out.si == 42
    assert out.bi == 1      # bool -> 0/1
    assert out.ti == 100    # time -> epoch seconds


def test_cast_varchar(spark):
    df = spark.createDataFrame(
        [(True, dt.datetime(2017, 1, 1, 12, 0, 0), 7)],
        ["b", "t", "i"],
    )
    out = apply_cast(
        df, [("b", "varchar", "bs"), ("t", "varchar", "ts"), ("i", "varchar", "is_")]
    ).collect()[0]
    assert out.bs == "true"
    assert out.ts == "2017-01-01T12:00:00Z"  # RFC3339
    assert out.is_ == "7"


def test_cast_datetime_from_string_and_epoch(spark):
    df = spark.createDataFrame(
        [("2017-01-01T12:00:00Z", 100)], ["s", "e"]
    )
    out = apply_cast(
        df, [("s", "datetime", "st"), ("e", "datetime", "et")]
    ).collect()[0]
    assert out.st == dt.datetime(2017, 1, 1, 12, 0, 0)
    assert out.et == dt.datetime(1970, 1, 1, 0, 1, 40)


def test_nil_passthrough(spark):
    # cast.go: nil -> nil for every target
    df = spark.createDataFrame(
        [(None, None)], "s string, f double"
    )
    out = apply_cast(
        df, [("s", "datetime", "a"), ("f", "int", "b")]
    ).collect()[0]
    assert out.a is None and out.b is None


def test_projection_and_rename_without_cast(spark):
    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    out = apply_cast(df, [("b", None, "renamed"), ("a", None, None)])
    assert out.columns == ["renamed", "a"]
