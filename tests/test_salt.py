"""Salted two-phase aggregation must equal the direct groupBy for
every supported measure, including skewed key distributions."""

import pytest
from pyspark.sql import functions as F

from analyst_spark.operators.salt import salted_agg


def test_salted_agg_equals_direct(spark):
    # skewed: key "hot" holds 80% of rows
    rows = [("hot" if i % 5 != 0 else f"k{i % 7}", i, float(i % 13))
            for i in range(500)]
    df = spark.createDataFrame(rows, "k string, n long, v double")
    direct = {
        r.k: (r.s, r.c, r.mn, r.mx, r.av)
        for r in df.groupBy("k").agg(
            F.sum("n").alias("s"), F.count("n").alias("c"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
            F.avg("v").alias("av"),
        ).collect()
    }
    salted = {
        r.k: (r.s, r.c, r.mn, r.mx, r.av)
        for r in salted_agg(
            df, ["k"],
            [("sum", "n", "s"), ("count", "n", "c"),
             ("min", "v", "mn"), ("max", "v", "mx"), ("avg", "v", "av")],
            salt_buckets=8,
        ).collect()
    }
    assert set(direct) == set(salted)
    for k in direct:
        d, s = direct[k], salted[k]
        assert d[:4] == s[:4]
        assert s[4] == pytest.approx(d[4], rel=1e-12)


def test_salted_agg_rejects_non_decomposable(spark):
    df = spark.createDataFrame([("a", 1)], "k string, n long")
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], [("median", "n", "m")])
