"""lineitem_profile: single-pass Deequ-style profiling. The hash
gate proves Spark==DuckDB on the real table; these pin the DEFINITION
on a hand-built table (nulls, completeness ppm, rendering) and the
scale path (approx profile = HLL, no Expand in the plan)."""

import contextlib
import io
import os

import pytest

from analyst_spark.plans.analytics_plans import _lineitem_profile
from analyst_spark.plans.catalog import QUERIES

SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)


@pytest.fixture(scope="module")
def tiny_sf(spark, tmp_path_factory):
    import datetime

    td = str(tmp_path_factory.mktemp("profile_sf"))
    ts = datetime.datetime(1995, 6, 1, 12, 30, 0)
    rows = [
        (1, 10, 5, 1, 17.0, 1234.56, 0.05, 0.02, "A", "F", ts),
        (2, 11, 5, 2, 3.0, 99.99, None, 0.0, "R", "O", None),
        (3, None, 6, 3, 17.0, 1234.56, 0.05, None, None, "F", ts),
    ]
    spark.createDataFrame(rows, SCHEMA).write.parquet(
        os.path.join(td, "lineitem.parquet")
    )
    return td


def test_profile_semantics(spark, tiny_sf):
    out = {
        r.col_name: r
        for r in QUERIES["lineitem_profile"](spark, tiny_sf).collect()
    }
    assert len(out) == 11
    pk = out["l_partkey"]
    assert (pk.n_rows, pk.n_null, pk.n_distinct) == (3, 1, 2)
    assert pk.completeness_ppm == (2 * 1000000) // 3  # exact floor ppm
    assert (pk.min_repr, pk.max_repr) == ("10", "11")
    # cents rendering of doubles is exact-integer
    ep = out["l_extendedprice"]
    assert (ep.min_repr, ep.max_repr) == ("9999", "123456")
    assert ep.n_distinct == 2
    # NULLs excluded from distinct; strings rendered verbatim
    rf = out["l_returnflag"]
    assert (rf.n_null, rf.n_distinct, rf.min_repr, rf.max_repr) == (
        1, 2, "A", "R",
    )
    # timestamp format pinned
    sd = out["l_shipdate"]
    assert sd.min_repr == "1995-06-01 12:30:00"
    assert sd.n_null == 1


def test_profile_empty_table(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("profile_empty"))
    spark.createDataFrame([], SCHEMA).write.parquet(
        os.path.join(td, "lineitem.parquet")
    )
    rows = QUERIES["lineitem_profile"](spark, td).collect()
    assert len(rows) == 11  # the profile itself never vanishes
    for r in rows:
        assert (r.n_rows, r.n_null, r.n_distinct) == (0, 0, 0)
        assert r.completeness_ppm is None
        assert r.min_repr is None and r.max_repr is None


def test_approx_profile_band_and_plan(spark, tiny_sf):
    """The 100 TB path: approx_count_distinct keeps the profile one
    pass of mergeable HLL sketches — values within the default-rsd
    band of exact, and NO Expand node in the plan."""
    exact = {
        r.col_name: r.n_distinct
        for r in _lineitem_profile(spark, tiny_sf, approx=False).collect()
    }
    approx_df = _lineitem_profile(spark, tiny_sf, approx=True)
    approx = {r.col_name: r.n_distinct for r in approx_df.collect()}
    for c, n in exact.items():
        # default rsd 5% -> 5-sigma band like the HLL entries
        assert abs(approx[c] - n) <= max(1, 0.25 * n), (c, approx[c], n)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        approx_df.explain("formatted")
    assert "Expand" not in buf.getvalue()

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _lineitem_profile(spark, tiny_sf, approx=False).explain("formatted")
    assert "Expand" in buf.getvalue()  # the honest cost of exactness
