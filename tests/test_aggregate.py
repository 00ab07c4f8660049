"""Operator-level AGGREGATE tests mirroring the reference's unit
fixtures (transforms/aggregate_test.go, {sum,avg,min,max}_test.go):
tiny literal frames in, exact expected rows out."""

import math

from pyspark.sql import functions as F

from analyst_spark.operators.aggregate import (
    aggregate,
    cdf,
    max_time_epoch,
    min_time_epoch,
    quantile,
)


def test_sum_global_group(spark):
    # TestSuperAggregate: 5 rows summing to 10 -> one row [10.0]
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,), (0.0,)], ["x"])
    out = aggregate(df, [], [("SUM", "x", "total")]).collect()
    assert len(out) == 1 and out[0].total == 10.0


def test_reducers_grouped(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", None), ("b", 7.0)],
        ["g", "x"],
    )
    out = {
        r.g: r
        for r in aggregate(
            df,
            ["g"],
            [
                ("SUM", "x", "s"),
                ("AVG", "x", "m"),
                ("MIN", "x", "lo"),
                ("MAX", "x", "hi"),
                ("COUNT", "x", "n"),
            ],
        ).collect()
    }
    assert out["a"].s == 4.0 and out["a"].m == 2.0
    assert out["b"].s == 12.0 and out["b"].m == 6.0  # NULLs skipped
    assert out["b"].lo == 5.0 and out["b"].hi == 7.0
    # COUNT counts rows (arg ignored) — intended-SQL semantics per
    # SURVEY §2.4 (reference count.go is buggy; divergence documented).
    assert out["b"].n == 3.0


def test_sum_all_null_group_is_null(spark):
    df = spark.createDataFrame([("a", None), ("a", None)], "g string, x double")
    out = aggregate(df, ["g"], [("SUM", "x", "s")]).collect()
    assert out[0].s is None


def test_quantile_exact_and_approx(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], ["x"])
    exact = df.agg(quantile("x", 0.5).alias("q")).collect()[0].q
    assert abs(exact - 50.5) < 1e-9
    approx = df.agg(quantile("x", 0.5, approx=True).alias("q")).collect()[0].q
    assert abs(approx - 50.5) <= 1.0  # t-digest-class tolerance


def test_cdf(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], ["x"])
    v = df.agg(cdf("x", 3.0).alias("c")).collect()[0].c
    assert abs(v - 0.3) < 1e-9


def test_min_max_time_strings_epoch(spark):
    # transforms/min.go:44-49 — MIN over RFC3339 strings yields float
    # epoch seconds.
    df = spark.createDataFrame(
        [("2017-01-01T00:00:00Z",), ("2017-01-01T00:01:40Z",)], ["t"]
    )
    row = df.agg(
        min_time_epoch("t").alias("lo"), max_time_epoch("t").alias("hi")
    ).collect()[0]
    assert row.hi - row.lo == 100.0
    assert isinstance(row.lo, float)


def test_approx_quantile_close_to_exact(spark):
    from analyst_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.01"
    exact = {r.l_returnflag: (r.p50, r.p95)
             for r in QUERIES["agg_quantile"](spark, sf).collect()}
    approx = {r.l_returnflag: (r.p50, r.p95)
              for r in QUERIES["agg_quantile_sketch"](spark, sf).collect()}
    assert set(exact) == set(approx)
    for k, (e50, e95) in exact.items():
        a50, a95 = approx[k]
        assert abs(a50 - e50) / e50 < 0.02, (k, a50, e50)
        assert abs(a95 - e95) / e95 < 0.02, (k, a95, e95)


def test_approx_quantile_exact_regime_is_deterministic(spark):
    """VERDICT r10 #8: agg_quantile_approx runs the GK sketch with
    accuracy >= 2x group rows, where rank error < 0.5 makes the
    result the exact rank element — equal to the data element DuckDB
    quantile_disc picks (the driver-gate oracle)."""
    import duckdb

    from analyst_spark.plans.catalog import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    got = {r.l_returnflag: (r.p50, r.p95)
           for r in QUERIES["agg_quantile_approx"](spark, sf).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf}/lineitem.parquet')"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(ORACLES["agg_quantile_approx"]).fetchall()
    }
    assert got == want
