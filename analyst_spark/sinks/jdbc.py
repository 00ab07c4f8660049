"""SQL destination (engine/sql_dest.go:10-201).

Batched INSERT append with the reference's options:

* ``rows_per_batch`` → JDBC ``batchsize`` (default 500 =
  DefaultRowsPerBatch, sql_dest.go:26).
* ``drop_nulls`` → skip any row containing a NULL
  (``df.na.drop("any")`` — sql_dest.go:194-201's hasNulls).
* Driver-specific bulk speed (the reference's BULK COPY / COPY
  inserters, sql_inserter.go:79-171) → ``reWriteBatchedInserts`` for
  Postgres; ``useBulkCopyForBatchInsert`` for MSSQL (the public
  mssql-jdbc ≥ 9.2 property that converts JDBC batches into TDS bulk
  copy — the ``mssql.CopyIn`` analog, sql_inserter.go:99-124).

Transactionality: Spark JDBC has no cross-sink transaction; the
staging-table pattern replaces the reference's 2PC manager
(SURVEY §2.7) — write to ``<table>_staging`` then atomically swap
with one driver-side statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def assemble_writer_options(
    url: str,
    table: str,
    rows_per_batch: int = 500,
    driver: str | None = None,
    staging: bool = False,
    **options: str,
) -> dict[str, str]:
    """The full JDBC writer option set, as a dict so the per-driver
    bulk strategy selection (sql_inserter.go:41-57 newSQLInserter) is
    unit-testable without database jars."""
    from analyst_spark.sources.jdbc import DRIVER_CLASSES

    out = {
        "url": url,
        "dbtable": f"{table}_staging" if staging else table,
        "batchsize": str(rows_per_batch),
    }
    if driver:
        out["driver"] = DRIVER_CLASSES.get(driver, driver)
    if "postgresql" in url or (driver or "").lower() in ("postgres", "postgresql"):
        # PostgresInserter's COPY-class speedup (sql_inserter.go:127-171):
        # pgjdbc rewrites the batch into multi-row inserts
        out["reWriteBatchedInserts"] = "true"
    if "sqlserver" in url or (driver or "").lower() in ("mssql", "sqlserver"):
        # MSSQLInserter's mssql.CopyIn (sql_inserter.go:99-124):
        # mssql-jdbc >= 9.2 turns the JDBC batch into a TDS bulk copy
        out["useBulkCopyForBatchInsert"] = "true"
    out.update(options)
    return out


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
    if drop_nulls:
        df = df.na.drop(how="any")
    writer = df.write.format("jdbc").mode("append")
    for k, v in assemble_writer_options(
        url, table, rows_per_batch, driver, staging, **options
    ).items():
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
