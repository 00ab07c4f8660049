"""Driver-based CONNECTION auto-wiring: reference scripts with
CONNECTION blocks run with NO injected handlers (compiler.go
connectionMap → engine instantiation). Injection stays the test seam
and always wins."""

from __future__ import annotations

import sqlite3

import pytest

from analyst_spark.aql.engine import execute_script


def test_sqlite_roundtrip_no_injection(spark, tmp_path):
    # EXEC creates + seeds, QUERY runs ON the database, INTO writes
    # back — all from the CONNECTION block's driver, nothing injected
    db = str(tmp_path / "auto.db")
    script = f"""
    CONNECTION 'DB' (
        Driver = 'sqlite3',
        ConnectionString = '{db}'
    )

    EXEC 'Init' FROM CONNECTION DB (
        CREATE TABLE People (id INTEGER PRIMARY KEY, name TEXT);
        INSERT INTO People VALUES (1, 'Bob');
        INSERT INTO People VALUES (2, 'Steven');
        CREATE TABLE Out (id INTEGER, name TEXT);
    )

    QUERY 'Fetch' FROM CONNECTION DB (
        SELECT id, name FROM People WHERE id <= 2 ORDER BY id
    ) INTO CONNECTION DB
    WITH (TABLE = 'Out', ROWS_PER_BATCH = 1)
    AFTER Init
    """
    res = execute_script(spark, script)
    assert [r.name for r in res.frames["fetch"].collect()] == ["Bob", "Steven"]
    chk = sqlite3.connect(db)
    assert chk.execute("SELECT id, name FROM Out ORDER BY id").fetchall() == [
        (1, "Bob"), (2, "Steven")]
    chk.close()


def test_sqlite_query_executes_on_the_database(spark, tmp_path):
    # sqlite-only SQL must work: proof the body ran on sqlite, not
    # through Spark SQL over a view
    db = str(tmp_path / "native.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE T (x INTEGER)")
    conn.executemany("INSERT INTO T VALUES (?)", [(1,), (2,), (3,)])
    conn.commit()
    conn.close()
    script = f"""
    CONNECTION 'DB' (Driver = 'sqlite3', ConnectionString = '{db}')

    QUERY 'Native' FROM CONNECTION DB (
        SELECT sqlite_version() AS v, CAST(total(x) AS INT) AS s FROM T
    )
    """
    res = execute_script(spark, script)
    row = res.frames["native"].collect()[0]
    assert row.s == 6 and row.v  # sqlite_version() exists only there


def test_injected_handler_wins_over_auto(spark, tmp_path):
    db = str(tmp_path / "shadow.db")
    script = f"""
    CONNECTION 'DB' (Driver = 'sqlite3', ConnectionString = '{db}')
    QUERY 'Q' FROM CONNECTION DB (SELECT one FROM DB)
    """
    marker = spark.createDataFrame([(99,)], ["one"])
    res = execute_script(
        spark, script, connections={"db": lambda s, o: marker}
    )
    # the injected handler's frame fed the AutoSQL view (and no
    # sqlite file was ever created) — proof injection won over auto
    assert [r.one for r in res.frames["q"].collect()] == [99]
    import os

    assert not os.path.exists(db)


def test_http_connection_auto_source(spark):
    # CONNECTION with http driver; fetch injected only at the module
    # seam requests would use — the handler wiring itself is auto
    from analyst_spark.aql.connections import build_connection_handlers

    handlers = build_connection_handlers(
        "webapi",
        {"DRIVER": "http", "URL": "https://x/awardees.json",
         "JSON_PATH": "awardees", "COLUMNS": "URL, Name"},
    )
    assert set(handlers) == {"webapi"}


def test_unknown_driver_still_reports_missing_handler(spark):
    script = """
    CONNECTION 'M' (Driver = 'frobnicator', ConnectionString = 'x')
    QUERY 'Q' FROM CONNECTION M (SELECT 1)
    """
    with pytest.raises(ValueError, match="no connection registered"):
        execute_script(spark, script)


def test_tx_manager_gets_auto_sqlite_connection(spark, tmp_path):
    from analyst_spark.sinks.transaction import JobTransactionManager

    db = str(tmp_path / "tx_auto.db")
    tx = JobTransactionManager()
    script = f"""
    CONNECTION 'DB' (Driver = 'sqlite3', ConnectionString = '{db}')
    EXEC 'Init' FROM CONNECTION DB (
        CREATE TABLE T (x INTEGER);
    )
    """
    execute_script(spark, script, tx_manager=tx)
    assert "db" in tx._conns  # auto connection registered for 2PC


def test_sqlite_source_schema_stable_empty_vs_nonempty(spark, tmp_path):
    # a plan's column types must not depend on whether data happens to
    # be present: schema comes from sqlite's declared-type derivation
    from analyst_spark.aql.connections import SQLiteConnection

    db = str(tmp_path / "schema_stable.db")
    seed = sqlite3.connect(db)
    seed.execute("CREATE TABLE T (x INTEGER, name TEXT, r REAL)")
    seed.commit()
    seed.close()
    c = SQLiteConnection(db)
    empty = c.source(spark, {}, "SELECT x, name, r FROM T")
    c.conn.execute("INSERT INTO T VALUES (1, 'a', 1.5)")
    full = c.source(spark, {}, "SELECT x, name, r FROM T")
    assert empty.schema == full.schema
    assert [f.dataType.simpleString() for f in full.schema.fields] == [
        "bigint", "string", "double",
    ]
    assert full.collect()[0][0] == 1


def test_auto_sqlite_managed_rollback_undoes_earlier_blocks(spark, tmp_path):
    # transaction_manager.go:21-41: ONE uncommitted transaction per
    # connection until job end — a mid-job failure undoes EVERY earlier
    # block's writes, including DDL, with no injected handlers
    from analyst_spark.sinks.transaction import JobTransactionManager

    db = str(tmp_path / "auto_tx_rollback.db")
    tx = JobTransactionManager()
    script = f"""
    CONNECTION 'DB' (Driver = 'sqlite3', ConnectionString = '{db}')
    EXEC 'Init' FROM CONNECTION DB (
        CREATE TABLE T (id INT PRIMARY KEY);
        INSERT INTO T VALUES (1);
    )
    EXEC 'Boom' FROM CONNECTION DB (
        INSERT INTO T VALUES (1);
    ) AFTER Init
    """
    with pytest.raises(sqlite3.IntegrityError):
        execute_script(spark, script, tx_manager=tx)
    check = sqlite3.connect(db)
    with pytest.raises(sqlite3.OperationalError):  # no such table
        check.execute("SELECT * FROM T")
    check.close()
