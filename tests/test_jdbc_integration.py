"""JDBC writer/reader integration against a REAL database.

The sandbox has no postgres/mssql servers or jars, but Spark ships
Apache Derby (its Hive-metastore store) — an embedded JDBC database
running inside the same JVM. That lets the actual JDBC code paths
execute end-to-end: batched INSERT via the writer (the reference's
SQLDestination batch path, engine/sql_dest.go:70-192), DROP_NULLS,
and the parallel range-partitioned read (reference has no analog —
its SQLSource is a single connection).

Driver-specific bulk options (reWriteBatchedInserts /
useBulkCopyForBatchInsert) remain option-assembly-tested in
test_connectors.py — they are pgjdbc/mssql-jdbc properties Derby
doesn't know.

Derby folds unquoted identifiers to uppercase while Spark's writer
CREATEs the table with quoted (exact-case) columns, so hand-written
queries against Spark-created tables must quote column names.
"""

from __future__ import annotations

import shutil

import pytest

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    db = tmp_path / "derbydb"
    yield f"jdbc:derby:{db};create=true"
    shutil.rmtree(db, ignore_errors=True)


def test_jdbc_write_1500_rows_and_read_back(spark, derby_url):
    from analyst_spark.sinks.jdbc import jdbc_sink
    from analyst_spark.sources.jdbc import jdbc_source

    df = spark.range(0, 1500).selectExpr(
        "id",
        "concat('name_', id) AS name",
        "CAST(id % 7 AS DOUBLE) AS score",
    )
    # batchsize 500 => the writer issues real batched INSERTs
    # (>= 3 batches per partition boundary), executing the path the
    # option-assembly tests only inspect
    jdbc_sink(df, derby_url, "people", rows_per_batch=500, driver=DERBY)

    back = jdbc_source(
        spark, derby_url, 'SELECT * FROM people', driver=DERBY
    )
    assert back.count() == 1500
    got = {
        (r["id"], r["name"], r["score"])
        for r in back.collect()
    }
    assert (0, "name_0", 0.0) in got
    assert (1499, "name_1499", float(1499 % 7)) in got


def test_jdbc_partitioned_parallel_read(spark, derby_url):
    from analyst_spark.sinks.jdbc import jdbc_sink
    from analyst_spark.sources.jdbc import jdbc_source

    df = spark.range(0, 1200).selectExpr("id", "id * 2 AS v")
    jdbc_sink(df, derby_url, "nums", driver=DERBY)

    back = jdbc_source(
        spark,
        derby_url,
        'SELECT "id", "v" FROM nums',
        driver=DERBY,
        partition_column="id",
        lower_bound=0,
        upper_bound=1200,
        num_partitions=4,
    )
    # the read is genuinely split into 4 range partitions
    assert back.rdd.getNumPartitions() == 4
    rows = back.collect()
    assert len(rows) == 1200
    assert all(r["v"] == r["id"] * 2 for r in rows)


def test_jdbc_drop_nulls_and_append(spark, derby_url):
    from analyst_spark.sinks.jdbc import jdbc_sink
    from analyst_spark.sources.jdbc import jdbc_source

    df = spark.range(0, 100).selectExpr(
        "id", "IF(id % 2 = 0, concat('n', id), NULL) AS name"
    )
    jdbc_sink(df, derby_url, "people2", drop_nulls=True, driver=DERBY)
    # second write appends (mode=append), exercising write-to-existing
    df2 = spark.range(100, 110).selectExpr("id", "concat('n', id) AS name")
    jdbc_sink(df2, derby_url, "people2", driver=DERBY)

    back = jdbc_source(
        spark, derby_url, 'SELECT "id" FROM people2', driver=DERBY
    )
    # 50 even-id rows survived DROP_NULLS + 10 appended
    assert back.count() == 60
