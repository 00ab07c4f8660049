"""Subprocess JSON-RPC plugin protocol (plugins/api.go + *_rpc.go):
real child processes speaking the reference's wire format, driven
through both the direct runners and a verbatim reference script."""

from __future__ import annotations

import os
import sys

from analyst_spark.aql.engine import execute_script
from analyst_spark.plugins_rpc import (
    run_destination_plugin,
    run_source_plugin,
    run_transform_plugin,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
FILTER = os.path.join(FIXTURES, "rpc_filter_plugin.py")
COUNTER = os.path.join(FIXTURES, "rpc_counter_source.py")


def test_transform_plugin_filters_rows(spark):
    df = spark.createDataFrame([(1,), (-1,), (2,)], ["Value"])
    outs = run_transform_plugin(
        spark, {"SliceOfData": df}, sys.executable, [FILTER]
    )
    (out,) = outs.values()
    assert sorted(r.Value for r in out.collect()) == [1, 2]


def test_transform_plugin_batches_large_input(spark):
    df = spark.createDataFrame([(i - 500,) for i in range(1500)], ["Value"])
    outs = run_transform_plugin(
        spark, {"S": df}, sys.executable, [FILTER], batch_rows=100
    )
    (out,) = outs.values()
    assert out.count() == 1000  # 0..999 survive the >= 0 filter


def test_source_plugin_polled_until_eos(spark):
    outs = run_source_plugin(
        spark, sys.executable, [COUNTER], options={"n": 5}
    )
    (df,) = outs.values()
    rows = {(r.i, r.sq) for r in df.collect()}
    assert rows == {(i, i * i) for i in range(5)}


def test_destination_plugin_receives_all_rows(spark):
    df = spark.createDataFrame([(i,) for i in range(7)], ["Value"])
    n = run_destination_plugin(df, sys.executable, [FILTER])
    assert n == 7


def test_compiler_with_transform_script_verbatim(spark):
    # compiler_test.go:557-607 TestCompilerWithTransform — the
    # reference spawns `python ./test_filter.py` through WITH
    # (Executable, Args) and lands ordered output in Excel A1:A4;
    # same script, same plugin protocol, Excel writer injected
    # (the reference re-reads the file; we capture the frame).
    landed = []

    def fake_excel(df, options):
        landed.append((df, dict(options)))

    script = f"""
    CONNECTION 'Workbook' (
        Driver = 'Excel',
        File = './output_transform.xlsx'
    )

    QUERY 'SliceOfData' FROM GLOBAL (
        SELECT 1 AS 'Value'
            UNION ALL
        SELECT -1 AS 'Value'
            UNION ALL
        SELECT 2 AS 'Value'
    )

    QUERY 'SliceOfData2' FROM GLOBAL (
        SELECT 10 AS 'Value'
            UNION ALL
        SELECT 11 AS 'Value'
            UNION ALL
        SELECT -2 AS 'Value'
    )

    TRANSFORM PLUGIN 'FilterNegatives' FROM BLOCK SliceOfData, BLOCK SliceOfData2 ()
    INTO CONNECTION Workbook
    WITH (
        Sheet = 'TestSheet', Range = 'A1:A*',
            Columns = 'Value', Multisource_Order = 'Sequential',
        Executable = '{sys.executable}', Args = '["{FILTER}"]', Overwrite = 'True'
    )
    """
    execute_script(spark, script, connections={"workbook.write": fake_excel})
    assert len(landed) == 1
    df, options = landed[0]
    # sequential multisource order: block 1's survivors then block 2's
    assert [r.Value for r in df.collect()] == [1, 2, 10, 11]
    assert options["SHEET"] == "TestSheet"


def test_plugin_error_surfaces(spark):
    import pytest

    from analyst_spark.plugins_rpc import PluginError, _RPCClient

    c = _RPCClient(sys.executable, ["-c", "import sys; sys.exit(0)"])
    c.dial()
    with pytest.raises(PluginError):
        c.call("receive", None)
    c.close()


def test_declared_destination_with_zero_rows_is_empty_frame(spark):
    # a plugin that declares a destination but routes nothing to it
    # must yield an empty frame, not crash schema inference
    from analyst_spark.plugins_rpc import _frames_from_rows

    outs = _frames_from_rows(
        spark,
        [{"destination": "a", "data": [1]}],
        {"a": ["x"], "b": ["y"]},
    )
    assert outs["a"].count() == 1
    assert outs["b"].count() == 0 and outs["b"].columns == ["y"]
