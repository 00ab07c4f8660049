"""JDBC source/exec (engine/sql_source.go:13-234).

The reference ships the user's SQL string verbatim to the remote
database inside a shared transaction. Spark's JDBC reader keeps the
verbatim-SQL property via ``option("query", sql)`` — the remote engine
does the filtering exactly as in the reference, and Catalyst can push
*additional* predicates down on top.

Scale notes baked into the options:

* ``partitionColumn/lowerBound/upperBound/numPartitions`` turn the
  single-connection read into N parallel range-partitioned reads —
  the 100 TB ingestion path the reference (single connection,
  row-at-a-time channel) cannot express.
* ``fetchsize`` ≥ 1000 avoids driver round-trips per row.

EXEC (DDL/DML, no resultset — compiler.go:368-382) cannot go through
the reader; it is a driver-side DB-API call, matching the reference's
ExecOnly branch semantics.

No JDBC driver jars ship in this container, so these are exercised in
tests via sqlite3 DB-API for exec + reader-option assembly only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DRIVER_CLASSES = {
    # driver name in CONNECTION blocks -> JDBC class (public drivers)
    "postgres": "org.postgresql.Driver",
    "mssql": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    "sqlite3": "org.sqlite.JDBC",
}


def jdbc_source(
    spark: SparkSession,
    url: str,
    query: str,
    driver: str | None = None,
    fetchsize: int = 1000,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("fetchsize", str(fetchsize))
    )
    if driver:
        reader = reader.option("driver", DRIVER_CLASSES.get(driver, driver))
    if partition_column is not None:
        # Spark rejects query+partitionColumn together; the partitioned
        # (parallel range-read) form requires dbtable with a subquery
        # alias so the partition column resolves unambiguously.
        reader = (
            reader.option("dbtable", f"({query}) AS asp_sub")
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    else:
        reader = reader.option("query", query)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def exec_statement(dbapi_conn, sql: str, params: tuple = ()) -> int:
    """EXEC: side-effect SQL via a DB-API connection (driver-side, as
    in the reference — engine/sql_source.go:137-168). Returns
    rowcount."""
    cur = dbapi_conn.cursor()
    try:
        cur.execute(sql, params)
        dbapi_conn.commit()
        return cur.rowcount
    finally:
        cur.close()
