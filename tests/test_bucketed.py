"""Bucketed co-located join: the plan must show NO Exchange on either
side (bucket layout replaces the shuffle), and results must equal the
plain join."""

import contextlib
import io

import pyspark.sql.functions as F
import pytest

from analyst_spark.operators.bucketed import bucketed_join, write_bucketed
from analyst_spark.operators.upsert import merge_upsert
from analyst_spark.tables import load_tables

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    t = load_tables(spark, SF)
    write_bucketed(
        t["orders"].select("o_orderkey", "o_totalprice"),
        "b_orders", "o_orderkey", 8, path=str(root / "orders"),
    )
    write_bucketed(
        t["lineitem"].select("l_orderkey", "l_quantity"),
        "b_lineitem", "l_orderkey", 8, path=str(root / "lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(
        spark, left, right,
        on=F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(
        spark, left, right,
        on=F.col("o_orderkey") == F.col("l_orderkey"),
    )
    t = load_tables(spark, SF)
    plain = t["orders"].join(
        t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey")
    )
    assert joined.count() == plain.count()


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], ["k", "s", "v"]
    )
    out = {r.k: (r.s, r.v) for r in merge_upsert(base, updates, "k").collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_multi_key(spark):
    base = spark.createDataFrame([(1, "x", 1.0), (1, "y", 2.0)], ["k1", "k2", "v"])
    updates = spark.createDataFrame([(1, "y", 9.0)], ["k1", "k2", "v"])
    out = {(r.k1, r.k2): r.v for r in merge_upsert(base, updates, ["k1", "k2"]).collect()}
    assert out == {(1, "x"): 1.0, (1, "y"): 9.0}
