"""lineitem_zorder_layout: the Morton-interleave arithmetic and the
pruning claim itself, pinned against a pure-Python model."""

import os

import pytest

from analyst_spark.plans.analytics_plans import _morton_expr, _Z_BITS, _Z_FILES
from analyst_spark.plans.catalog import QUERIES


def _morton_py(px, sy, bits):
    out = 0
    for b in range(bits):
        out |= ((px >> b) & 1) << (2 * b + 1)
        out |= ((sy >> b) & 1) << (2 * b)
    return out


def test_morton_expr_matches_python(spark):
    df = spark.createDataFrame(
        [(px, sy) for px in range(0, 256, 17) for sy in range(0, 256, 23)],
        "px long, sy long",
    )
    from pyspark.sql import functions as F

    rows = df.withColumn(
        "m", F.expr(_morton_expr("px", "sy", _Z_BITS))
    ).collect()
    for r in rows:
        assert r.m == _morton_py(r.px, r.sy, _Z_BITS), (r.px, r.sy)


def test_zorder_prunes_both_dims(spark):
    out = {
        r.layout: r
        for r in QUERIES["lineitem_zorder_layout"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    z, lin = out["zorder"], out["linear_pk"]
    assert z.n_rows == lin.n_rows > 0
    # z-order: BOTH dims narrow (64 files = 8x8 tiles -> ~125000 ppm
    # ideal); linear: first dim narrow, second essentially unpruned.
    assert z.avg_pk_span_ppm < 300000 and z.avg_sk_span_ppm < 300000
    assert lin.avg_pk_span_ppm < z.avg_pk_span_ppm
    assert lin.avg_sk_span_ppm > 900000
    assert z.n_files <= _Z_FILES and lin.n_files <= _Z_FILES


def test_zorder_empty_table(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("zorder_empty"))
    spark.createDataFrame(
        [],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.parquet(os.path.join(td, "lineitem.parquet"))
    # no rows -> no files; the outer global aggregate still returns
    # one summary row per layout (agg-without-GROUP-BY semantics,
    # identical on DuckDB) with NULL span metrics
    rows = QUERIES["lineitem_zorder_layout"](spark, td).collect()
    assert sorted(r.layout for r in rows) == ["linear_pk", "zorder"]
    for r in rows:
        assert r.n_files == 0
        assert r.n_rows is None
        assert r.avg_pk_span_ppm is None and r.avg_sk_span_ppm is None
