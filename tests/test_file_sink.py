"""Partitioned lake writer: directory layout, read-back equality,
partition pruning in the scan plan, and compaction."""

import contextlib
import glob
import io
import os

import pyspark.sql.functions as F

from analyst_spark.sinks.files import compact, read_partitioned, write_partitioned
from analyst_spark.tables import load_tables

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_write_creates_partition_dirs_and_roundtrips(spark, tmp_path):
    ev = load_tables(spark, SF)["events"].withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "events_lake")
    write_partitioned(ev, out, ["event_type"])
    dirs = {os.path.basename(p) for p in glob.glob(out + "/event_type=*")}
    assert len(dirs) >= 2 and all(d.startswith("event_type=") for d in dirs)
    back = read_partitioned(spark, out)
    assert back.count() == ev.count()


def test_partition_filter_prunes_at_plan_time(spark, tmp_path):
    ev = load_tables(spark, SF)["events"]
    out = str(tmp_path / "events_lake")
    write_partitioned(ev, out, ["event_type"])
    scan = read_partitioned(spark, out).filter(F.col("event_type") == "click")
    plan = _plan(scan)
    assert "PartitionFilters" in plan
    # pruning must reach the scan: the partition filter appears in
    # the scan node, not as a post-scan Filter on event_type only
    assert "event_type" in plan.split("PartitionFilters", 1)[1][:200]


def test_single_task_per_partition_no_small_files(spark, tmp_path):
    ev = load_tables(spark, SF)["events"]
    out = str(tmp_path / "events_lake")
    write_partitioned(ev, out, ["event_type"])
    for d in glob.glob(out + "/event_type=*"):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) <= 2, (d, files)


def test_compact_preserves_rows(spark, tmp_path):
    ev = load_tables(spark, SF)["events"]
    out = str(tmp_path / "events_lake")
    # deliberately fragment: many shuffle partitions before write
    write_partitioned(ev.repartition(16), out, ["event_type"])
    n = read_partitioned(spark, out).count()
    compact(spark, out, ["event_type"], target_partitions=1)
    assert read_partitioned(spark, out).count() == n
