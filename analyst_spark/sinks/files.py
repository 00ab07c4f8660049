"""Partitioned lake writer — the file-sink path the reference lacks
entirely (its destinations are row-batched JDBC/Excel/console,
engine/sql_dest.go / excel_dest.go). At 100 TB the dominant sink is a
partitioned parquet/lakehouse layout; these helpers encode the two
decisions that matter at that scale:

* **Partition columns** become directories → partition pruning at
  read time (a date-filtered scan touches only matching dirs).
  Choose low-cardinality columns (date, source); high-cardinality
  partitioning creates a small-file explosion.
* **File sizing**: target ~128-512 MB files. A repartition on the
  partition columns before the write puts each output partition's
  rows in the fewest tasks, avoiding the tasks×partitions small-file
  cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_by``.

    Repartitions on the partition columns first so each Hive
    partition is produced by as few tasks as possible (without it,
    every one of N shuffle tasks can open a file in every one of P
    partitions → N×P small files)."""
    out = df.repartition(*[F.col(c) for c in partition_by])
    w = out.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout back; partition columns are
    reconstructed from directory names and filters on them prune at
    planning time (PartitionFilters in the scan node)."""
    return spark.read.parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    partition_by: list[str],
    target_partitions: int | None = None,
) -> None:
    """Small-file compaction: rewrite a layout in place with fewer,
    larger files per partition (the maintenance job every streaming
    ingest needs; micro-batches leave one file per trigger)."""
    df = spark.read.parquet(path)
    if target_partitions:
        df = df.coalesce(target_partitions)
    tmp = path.rstrip("/") + "__compact_tmp"
    write_partitioned(df, tmp, partition_by, mode="overwrite")
    # swap: parquet has no atomic rename contract on object stores;
    # on HDFS/posix this two-step is the standard pattern
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)
