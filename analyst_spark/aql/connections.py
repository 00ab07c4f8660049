"""Driver-based CONNECTION auto-wiring (compiler.go connectionMap +
engine source/destination instantiation).

The reference instantiates sources and destinations from a
CONNECTION block's DRIVER; injected handlers were previously the only
path here. This factory builds handlers for the built-in drivers so a
reference script with CONNECTION blocks runs with no injection:

* ``sqlite3`` — stdlib DB-API. The reference ships go-sqlite3 as its
  embedded engine; query bodies execute ON the database (a SQL
  connection is a remote engine, not a table provider), writes batch
  INSERT into WITH(TABLE=...), EXEC runs statements. One shared
  connection per name per job, registered with the job transaction
  manager when present (the reference's shared-tx semantics).
* ``excel`` — sources/excel.py + sinks/excel.py (FILE/SHEET/RANGE/
  COLUMNS/TRANSPOSE/TEMPLATE/OVERWRITE options).
* ``http`` — sources/http.py (URL/JSON_PATH/COLUMNS/PAGE_SIZE).
* ``mandrill`` — sinks/email.py; delivery needs SMTP_* options (or an
  injected transport), rendering works without.

Injected handlers always win — they are the test seam, exactly like
the reference's engine hooks. JDBC-url connections (DRIVER='jdbc' or
a CONNECTIONSTRING starting with 'jdbc:') use the Spark-native
distributed reader/writer in sources/jdbc.py instead of DB-API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SQL_DRIVERS = {"sqlite3", "mssql", "postgres", "mysql"}


def _split_columns(v) -> list[str]:
    return [c.strip() for c in str(v or "").split(",") if c.strip()]


class SQLiteConnection:
    """Shared DB-API connection for one CONNECTION name (engine/
    sql_source.go + sql_dest.go semantics on the embedded engine)."""

    def __init__(self, path: str):
        import sqlite3

        self.conn = sqlite3.connect(path, check_same_thread=False)

    def source(self, spark: SparkSession, options: dict, body: str) -> DataFrame:
        cur = self.conn.cursor()
        cur.execute(body)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        if not rows:
            return spark.createDataFrame([], schema=", ".join(f"`{c}` string" for c in cols))
        return spark.createDataFrame([tuple(r) for r in rows], schema=cols)

    source.executes_sql = True  # engine: don't re-run the body on Spark

    def write(self, df: DataFrame, options: dict) -> None:
        from analyst_spark.aql.parser import truthy

        table = str(options.get("TABLE") or "")
        if not table:
            raise ValueError("SQL destination requires WITH (TABLE = ...)")
        if truthy(options.get("DROP_NULLS")):
            df = df.na.drop(how="any")
        batch = int(options.get("ROWS_PER_BATCH") or 500)
        cols = df.columns
        placeholders = ", ".join("?" for _ in cols)
        sql = (
            f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders})"
        )
        cur = self.conn.cursor()
        buf: list[tuple] = []
        for row in df.toLocalIterator():
            buf.append(tuple(row))
            if len(buf) >= batch:
                cur.executemany(sql, buf)
                buf = []
        if buf:
            cur.executemany(sql, buf)
        self.conn.commit()

    def exec_(self, body: str, options: dict) -> None:
        cur = self.conn.cursor()
        for stmt in _split_statements(body):
            cur.execute(stmt)
        self.conn.commit()


def _split_statements(body: str) -> list[str]:
    """';'-split outside string literals."""
    out, cur, in_str = [], [], False
    for ch in body:
        if ch == "'":
            in_str = not in_str
        if ch == ";" and not in_str:
            s = "".join(cur).strip()
            if s:
                out.append(s)
            cur = []
        else:
            cur.append(ch)
    s = "".join(cur).strip()
    if s:
        out.append(s)
    return out


def _excel_handlers(name: str, options: dict) -> dict:
    path = str(options.get("FILE") or options.get("CONNECTIONSTRING") or "")

    def source(spark, blk_options, body=None):
        from analyst_spark.sources.excel import excel_source

        return excel_source(
            spark, path,
            sheet=str(blk_options.get("SHEET") or "Sheet1"),
            rng=str(blk_options.get("RANGE") or ""),
            columns=_split_columns(blk_options.get("COLUMNS")) or None,
        )

    def write(df, blk_options):
        from analyst_spark.aql.parser import truthy
        from analyst_spark.sinks.excel import excel_sink

        excel_sink(
            df, path,
            sheet=str(blk_options.get("SHEET") or "Sheet1"),
            rng=str(blk_options.get("RANGE") or ""),
            transpose=truthy(blk_options.get("TRANSPOSE")),
            template=blk_options.get("TEMPLATE"),
            overwrite=truthy(blk_options.get("OVERWRITE", "True")),
            columns=_split_columns(blk_options.get("COLUMNS")) or None,
        )

    return {name: source, f"{name}.write": write}


def _http_handlers(name: str, conn_options: dict) -> dict:
    def source(spark, blk_options, body=None):
        from analyst_spark.sources.http import http_source

        merged = dict(conn_options)
        merged.update(blk_options)
        ps = merged.get("PAGE_SIZE")
        return http_source(
            spark,
            url=str(merged.get("URL") or ""),
            columns=_split_columns(merged.get("COLUMNS")),
            json_path=merged.get("JSON_PATH"),
            page_size=int(ps) if ps else None,
        )

    return {name: source}


def _mandrill_handlers(name: str, conn_options: dict) -> dict:
    from analyst_spark.sinks.email import email_write_handler, smtp_transport

    send_fn = None
    if conn_options.get("SMTP_HOST"):
        send_fn = smtp_transport(
            host=str(conn_options["SMTP_HOST"]),
            port=int(conn_options.get("SMTP_PORT") or 25),
        )
    return {f"{name}.write": email_write_handler(send_fn=send_fn)}


def build_connection_handlers(
    name: str, options: dict, tx_manager=None
) -> dict:
    """Handlers for one CONNECTION block, keyed the way the executor
    looks them up: ``name`` (source), ``name.write``, ``name.exec``.
    Unknown drivers return {} — the executor then reports the missing
    handler exactly as before."""
    name = name.lower()
    driver = str(options.get("DRIVER") or "").lower()
    connstr = str(options.get("CONNECTIONSTRING") or "")
    if driver == "excel":
        return _excel_handlers(name, options)
    if driver == "http":
        return _http_handlers(name, options)
    if driver == "mandrill":
        return _mandrill_handlers(name, options)
    if driver == "jdbc" or connstr.startswith("jdbc:"):
        return _jdbc_handlers(name, options)
    if driver in _SQL_DRIVERS:
        if driver != "sqlite3":
            # non-embedded engines reach Spark through JDBC; DB-API
            # shims for them are environment-specific
            raise ValueError(
                f"driver {driver!r} needs a JDBC CONNECTIONSTRING "
                "(jdbc:...) or an injected handler"
            )
        c = SQLiteConnection(connstr)
        if tx_manager is not None:
            tx_manager.register(name, c.conn)

        def source(spark, blk_options, body=None):
            return c.source(spark, blk_options, body)

        source.executes_sql = True
        return {
            name: source,
            f"{name}.write": c.write,
            f"{name}.exec": c.exec_,
        }
    return {}


def _jdbc_handlers(name: str, conn_options: dict) -> dict:
    url = str(conn_options.get("CONNECTIONSTRING") or "")

    def source(spark, blk_options, body=None):
        from analyst_spark.sources.jdbc import jdbc_source

        return jdbc_source(spark, url, query=body or "")

    source.executes_sql = True

    def write(df, blk_options):
        from analyst_spark.aql.parser import truthy
        from analyst_spark.sinks.jdbc import jdbc_sink

        jdbc_sink(
            df, url,
            table=str(blk_options.get("TABLE") or ""),
            rows_per_batch=int(blk_options.get("ROWS_PER_BATCH") or 500),
            drop_nulls=truthy(blk_options.get("DROP_NULLS")),
        )

    return {name: source, f"{name}.write": write}
