"""LIVE PostgreSQL execution of the reference's postgres driver
surface (engine/sql_source.go registered drivers,
engine/sql_inserter.go:126-171 PostgresInserter): this container
ships a real postgres server binary; tests boot it under a non-root
uid on a unix socket (trust auth) and drive EXEC / QUERY / batched
INTO writes through the stdlib wire client — closing the round-5
"postgres execution is option-assembly-only" gap with a real server
instead of an emulation.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import uuid

import pytest

from analyst_spark.aql.engine import execute_script

PG_BIN = "/usr/local/bin"


def _have_pg() -> bool:
    return (
        os.path.exists(f"{PG_BIN}/initdb")
        and os.path.exists(f"{PG_BIN}/pg_ctl")
        and os.geteuid() == 0  # need su to a non-root uid
        and shutil.which("su") is not None
    )


def _su(cmd: str, **kw):
    return subprocess.run(
        ["su", "nobody", "-s", "/bin/bash", "-c", cmd],
        capture_output=True, text=True, cwd="/tmp", **kw,
    )


@pytest.fixture(scope="module")
def pg_sockdir():
    if not _have_pg():
        pytest.skip("no postgres server binaries / not root")
    base = f"/tmp/aspg_{uuid.uuid4().hex[:8]}"
    os.makedirs(base)
    shutil.chown(base, "nobody")
    r = _su(f"{PG_BIN}/initdb -D {base}/data -A trust -U pg")
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    r = _su(
        f"{PG_BIN}/pg_ctl -D {base}/data -w "
        f"-o \"-c listen_addresses='' -c unix_socket_directories={base}\" "
        f"-l {base}/log start"
    )
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"pg_ctl start failed: {r.stderr[-300:]}")
    try:
        yield base
    finally:
        _su(f"{PG_BIN}/pg_ctl -D {base}/data -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)


def _connect(sockdir):
    from analyst_spark.sources.pgwire import PgWireConnection

    return PgWireConnection(sockdir=sockdir, user="pg", database="postgres")


def test_pgwire_types_params_and_errors(pg_sockdir):
    from analyst_spark.sources.pgwire import PgError

    conn = _connect(pg_sockdir)
    cur = conn.cursor()
    cur.execute(
        "SELECT 1 AS i, 2.5 AS f, 'x''y' AS s, TRUE AS b, NULL AS n, "
        "DATE '2024-01-02' AS d, TIMESTAMP '2024-01-02 03:04:05' AS ts"
    )
    row = cur.fetchone()
    import datetime

    assert row == (
        1, 2.5, "x'y", True, None,
        datetime.date(2024, 1, 2), datetime.datetime(2024, 1, 2, 3, 4, 5),
    )
    assert [d[0] for d in cur.description] == ["i", "f", "s", "b", "n", "d", "ts"]
    # positional ? parameters are literal-quoted (injection-safe quoting)
    cur.execute("SELECT ? AS v, ? AS w", ("it's", 7))
    assert cur.fetchone() == ("it's", 7)
    # server errors surface as PgError with the message
    with pytest.raises(PgError, match="no_such_table"):
        cur.execute("SELECT * FROM no_such_table")
    # and the connection stays usable afterwards
    cur.execute("SELECT 42 AS ok")
    assert cur.fetchone() == (42,)
    conn.close()


def test_pgwire_exec_statement_and_commit(pg_sockdir):
    """sources/jdbc.py exec_statement (the reference's ExecOnly
    branch, sql_source.go:137-168) against live postgres."""
    from analyst_spark.sources.jdbc import exec_statement

    conn = _connect(pg_sockdir)
    exec_statement(conn, "CREATE TABLE exec_t (id INT, name TEXT)")
    n = exec_statement(
        conn, "INSERT INTO exec_t VALUES (1, 'a'), (2, 'b')"
    )
    assert n == 2
    cur = conn.cursor()
    cur.execute("SELECT count(*) FROM exec_t")
    assert cur.fetchone() == (2,)
    conn.close()


def test_pgwire_transaction_rollback(pg_sockdir):
    conn = _connect(pg_sockdir)
    cur = conn.cursor()
    cur.execute("CREATE TABLE txt_t (x INT)")
    cur.execute("BEGIN")
    cur.execute("INSERT INTO txt_t VALUES (1)")
    assert conn.in_txn
    conn.rollback()
    cur.execute("SELECT count(*) FROM txt_t")
    assert cur.fetchone() == (0,)
    conn.close()


def test_aql_postgres_roundtrip_no_injection(spark, pg_sockdir):
    """The reference-shaped flow on a LIVE postgres: EXEC creates and
    seeds, QUERY executes ON the server (postgres-only SQL proves
    it), INTO writes back in batches — CONNECTION driver='postgres',
    nothing injected."""
    connstr = f"host={pg_sockdir} user=pg dbname=postgres"
    script = f"""
    CONNECTION 'PG' (
        Driver = 'postgres',
        ConnectionString = '{connstr}'
    )

    EXEC 'Init' FROM CONNECTION PG (
        CREATE TABLE people (id INT PRIMARY KEY, name TEXT);
        INSERT INTO people VALUES (1, 'Bob');
        INSERT INTO people VALUES (2, 'Steven');
        INSERT INTO people VALUES (3, 'Zoe');
        CREATE TABLE out (id BIGINT, name TEXT, vlen BIGINT)
    )

    QUERY 'Fetch' FROM CONNECTION PG (
        SELECT id, name, length(version()) AS vlen
        FROM people WHERE id <= 2 ORDER BY id
    ) INTO CONNECTION PG
    WITH (TABLE = 'out', ROWS_PER_BATCH = 1)
    AFTER Init
    """
    res = execute_script(spark, script)
    assert [r.name for r in res.frames["fetch"].collect()] == ["Bob", "Steven"]
    chk = _connect(pg_sockdir)
    cur = chk.cursor()
    cur.execute("SELECT id, name FROM out ORDER BY id")
    assert cur.fetchall() == [(1, "Bob"), (2, "Steven")]
    chk.close()


def test_pg_connstr_forms():
    from analyst_spark.aql.connections import parse_pg_connstr

    assert parse_pg_connstr("postgres://u:p@db.example:5433/mydb") == {
        "user": "u", "password": "p", "host": "db.example",
        "port": 5433, "database": "mydb",
    }
    assert parse_pg_connstr("host=/tmp/sock user=pg dbname=postgres") == {
        "sockdir": "/tmp/sock", "user": "pg", "database": "postgres",
    }


def test_aql_postgres_tx_rollback(spark, pg_sockdir):
    """compiler_test.go:640-688 TestTxManagerRollback on LIVE
    postgres: a PK violation in the last EXEC rolls back EVERY write
    on the shared managed transaction — including the CREATE TABLE
    (postgres DDL is transactional, like sqlite's)."""
    from analyst_spark.sinks.transaction import JobTransactionManager
    from analyst_spark.sources.pgwire import PgError

    connstr = f"host={pg_sockdir} user=pg dbname=postgres"
    script = f"""
    CONNECTION 'PG' (Driver = 'postgres', ConnectionString = '{connstr}')

    EXEC 'CreateTables' FROM CONNECTION PG (
        CREATE TABLE tx_test (id INT PRIMARY KEY)
    )

    EXEC 'InsertOne' FROM CONNECTION PG (
        INSERT INTO tx_test VALUES (1)
    ) AFTER CreateTables;

    EXEC 'InsertTwo' FROM CONNECTION PG (
        INSERT INTO tx_test VALUES (2);
        INSERT INTO tx_test VALUES (1)
    ) AFTER InsertOne;
    """
    tx = JobTransactionManager()
    with pytest.raises(PgError, match="duplicate key|unique"):
        execute_script(spark, script, tx_manager=tx)
    chk = _connect(pg_sockdir)
    cur = chk.cursor()
    cur.execute(
        "SELECT count(*) FROM pg_tables WHERE tablename = 'tx_test'"
    )
    assert cur.fetchone() == (0,), "CREATE TABLE must have rolled back"
    chk.close()
