"""SQL destination (engine/sql_dest.go:10-201).

Batched INSERT append with the reference's options:

* ``rows_per_batch`` → JDBC ``batchsize`` (default 500 =
  DefaultRowsPerBatch, sql_dest.go:26).
* ``drop_nulls`` → skip any row containing a NULL
  (``df.na.drop("any")`` — sql_dest.go:194-201's hasNulls).
* Driver-specific bulk speed (the reference's BULK COPY / COPY
  inserters, sql_inserter.go:79-171) → ``reWriteBatchedInserts`` for
  Postgres, ``bulkCopyToSqlDb``-style tuning left to driver options.

Transactionality: Spark JDBC has no cross-sink transaction; the
staging-table pattern replaces the reference's 2PC manager
(SURVEY §2.7) — write to ``<table>_staging`` then atomically swap
with one driver-side statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    rows_per_batch: int = 500,
    drop_nulls: bool = False,
    driver: str | None = None,
    staging: bool = False,
    **options: str,
) -> None:
    from analyst_spark.sources.jdbc import DRIVER_CLASSES

    if drop_nulls:
        df = df.na.drop(how="any")
    target = f"{table}_staging" if staging else table
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", target)
        .option("batchsize", str(rows_per_batch))
        .mode("append")
    )
    if driver:
        writer = writer.option("driver", DRIVER_CLASSES.get(driver, driver))
    if "postgresql" in url:
        writer = writer.option("reWriteBatchedInserts", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def commit_staging(dbapi_conn, table: str) -> None:
    """Atomic publish of a staged write: one transaction on the target
    database (the semantic replacement for the reference's shared-Tx
    commit, engine/transaction_manager.go:160-224)."""
    cur = dbapi_conn.cursor()
    try:
        cur.execute(f"DELETE FROM {table}")
        cur.execute(f"INSERT INTO {table} SELECT * FROM {table}_staging")
        cur.execute(f"DELETE FROM {table}_staging")
        dbapi_conn.commit()
    except Exception:
        dbapi_conn.rollback()
        raise
    finally:
        cur.close()
