"""Connector tests: Excel range/coercion core, HTTP source (live
local server + injected-fetch variants), and the plugin surface —
mirroring the reference's source/destination integration tests
(engine/excel_source.go:226-272, engine/http_source_test.go,
plugins/rpc_test.go)."""

import http.server
import json
import threading
from datetime import datetime

import pytest

from analyst_spark.sources.excel import (
    coerce_cell,
    col_to_index,
    matrix_to_rows,
    parse_range,
)
from analyst_spark.sources.http import http_source
from analyst_spark.sources.plugin import (
    python_destination,
    python_source,
    python_transform,
)

# ------------------------------------------------------------- excel


def test_col_to_index():
    assert col_to_index("A") == 1
    assert col_to_index("Z") == 26
    assert col_to_index("AB") == 28


def test_parse_range_wildcards():
    assert parse_range("A1:B4") == (1, 1, 2, 4)
    assert parse_range("A1:B*") == (1, 1, 2, None)
    with pytest.raises(ValueError):
        parse_range("A*:B*")  # two wildcards
    with pytest.raises(ValueError):
        parse_range("1A:B2")


def test_coerce_cell_chain():
    # int → float → bool → time → string (excel_source.go:226-272)
    assert coerce_cell("42") == 42
    assert coerce_cell("4.5") == 4.5
    assert coerce_cell("TRUE") is True
    assert coerce_cell("2024-01-02T03:04:05Z") == datetime(2024, 1, 2, 3, 4, 5)
    assert coerce_cell("hello") == "hello"
    assert coerce_cell(None) is None


def test_matrix_header_and_wildcard_stop():
    cells = [
        ["name", "qty"],
        ["a", "1"],
        ["b", "2"],
        [None, None],      # wildcard must stop here
        ["ghost", "9"],
    ]
    names, rows = matrix_to_rows(cells, "A1:B*", header_row=True)
    assert names == ["name", "qty"]
    assert rows == [["a", 1], ["b", 2]]


def test_matrix_fixed_range_no_header():
    cells = [["a", "1"], ["b", "2"], ["c", "3"]]
    names, rows = matrix_to_rows(
        cells, "A1:B2", header_row=False, columns=["n", "q"]
    )
    assert names == ["n", "q"]
    assert rows == [["a", 1], ["b", 2]]


# -------------------------------------------------------------- http


@pytest.fixture(scope="module")
def http_server():
    """Paginated JSON endpoint: 5 items, page size honored via
    limit/offset params, empty page past the end."""
    items = [{"ID": i, "Name": f"n{i}", "extra": "x"} for i in range(5)]

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            from urllib.parse import parse_qs, urlparse

            q = parse_qs(urlparse(self.path).query)
            lim = int(q.get("limit", [100])[0])
            off = int(q.get("offset", [0])[0])
            body = json.dumps({"data": {"rows": items[off : off + lim]}}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/items"
    srv.shutdown()


def test_http_source_paginated_live(spark, http_server):
    df = http_source(
        spark,
        http_server,
        columns=["id", "name"],   # case-insensitive match, extra key dropped
        json_path="data.rows",
        page_size=2,
    )
    rows = sorted((r.id, r.name) for r in df.collect())
    assert rows == [(i, f"n{i}") for i in range(5)]


def test_http_source_missing_key_is_null(spark):
    payload = {"rows": [{"a": 1}, {"a": 2, "b": "x"}]}
    df = http_source(
        spark, "http://unused", columns=["a", "b"], json_path="rows",
        _fetch=lambda u, p, h: payload,
    )
    rows = sorted((r.a, r.b) for r in df.collect())
    assert rows == [(1, None), (2, "x")]


def test_http_source_positional_arrays(spark):
    payload = [[1, "a"], [2, "b"]]
    df = http_source(
        spark, "http://unused", columns=["k", "v"], _fetch=lambda u, p, h: payload
    )
    assert sorted((r.k, r.v) for r in df.collect()) == [(1, "a"), (2, "b")]
    with pytest.raises(Exception):
        http_source(
            spark, "http://unused", columns=["k"], _fetch=lambda u, p, h: payload
        ).collect()


# ------------------------------------------------------------ plugin


def test_python_source_generator(spark):
    def gen():
        yield from ([i, i * i] for i in range(4))

    df = python_source(spark, gen, ["n", "sq"])
    assert sorted((r.n, r.sq) for r in df.collect()) == [(i, i * i) for i in range(4)]


def test_python_transform_udtf(spark):
    df = python_source(spark, [[1], [2], [3], [4]], ["n"])

    def keep_even_duplicate(pdf):
        out = pdf[pdf.n % 2 == 0]
        import pandas as pd

        return pd.concat([out, out])  # N in, 2M out

    res = python_transform(df, keep_even_duplicate, "n long")
    assert sorted(r.n for r in res.collect()) == [2, 2, 4, 4]


def test_python_destination_batches(spark, tmp_path):
    # fn runs inside executor workers — observe it through the
    # filesystem, not driver memory
    df = python_source(spark, [[i] for i in range(10)], ["n"]).coalesce(1)
    out = tmp_path / "batches"
    out.mkdir()

    def sink(batch):
        import os
        import uuid

        with open(out / f"{os.getpid()}-{uuid.uuid4().hex}.json", "w") as f:
            json.dump([list(r) for r in batch], f)

    python_destination(df, sink, batch_size=4)
    batches = [json.load(open(p)) for p in out.iterdir()]
    assert sorted(sum(batches, [])) == [[i] for i in range(10)]
    assert max(len(b) for b in batches) <= 4


# -------------------------------------------------------------- jdbc


def test_exec_statement_and_staging_commit(tmp_path):
    """EXEC + staged-publish pattern on a real DB-API connection
    (sqlite3 stands in for the remote database, as in the reference's
    own tests — engine/sql_test.go)."""
    import sqlite3

    conn = sqlite3.connect(tmp_path / "t.db")
    from analyst_spark.sinks.jdbc import commit_staging
    from analyst_spark.sources.jdbc import exec_statement

    exec_statement(conn, "CREATE TABLE t (k INTEGER, v TEXT)")
    exec_statement(conn, "CREATE TABLE t_staging (k INTEGER, v TEXT)")
    exec_statement(conn, "INSERT INTO t VALUES (0, 'stale')")
    n = exec_statement(
        conn, "INSERT INTO t_staging VALUES (1, 'a'), (2, 'b')"
    )
    assert n == 2
    commit_staging(conn, "t")
    rows = conn.execute("SELECT k, v FROM t ORDER BY k").fetchall()
    assert rows == [(1, "a"), (2, "b")]
    assert conn.execute("SELECT count(*) FROM t_staging").fetchone()[0] == 0


def test_staging_commit_rolls_back_on_error(tmp_path):
    import sqlite3

    conn = sqlite3.connect(tmp_path / "t.db")
    from analyst_spark.sinks.jdbc import commit_staging
    from analyst_spark.sources.jdbc import exec_statement

    exec_statement(conn, "CREATE TABLE t (k INTEGER)")
    exec_statement(conn, "INSERT INTO t VALUES (7)")
    # no staging table -> commit must fail and leave t untouched
    with pytest.raises(Exception):
        commit_staging(conn, "t")
    assert conn.execute("SELECT k FROM t").fetchall() == [(7,)]


# -------------------------------------------------------- excel sink


def test_layout_cells_rowwise_and_bounds():
    from analyst_spark.sinks.excel import layout_cells

    cells = layout_cells([[1, "a"], [2, "b"]], "B2:C*")
    assert cells == {(2, 2): 1, (3, 2): "a", (2, 3): 2, (3, 3): "b"}
    with pytest.raises(ValueError):
        layout_cells([[1, 2, 3]], "A1:B*")     # too narrow
    with pytest.raises(ValueError):
        layout_cells([[1], [2], [3]], "A1:A2")  # fixed range too short


def test_layout_cells_transpose():
    from analyst_spark.sinks.excel import layout_cells

    # two rows become two COLUMNS (excel_dest.go TRANSPOSE)
    cells = layout_cells([[1, "a"], [2, "b"]], "A1:B*", transpose=True)
    assert cells == {(1, 1): 1, (1, 2): "a", (2, 1): 2, (2, 2): "b"}
    with pytest.raises(ValueError):
        layout_cells([[1], [2], [3]], "A1:B*", transpose=True)  # 3 rows, 2 cols


# -------------------------------------------- literal type inference


def test_frame_unifies_over_all_rows(spark):
    """All-NULL first row and int/float mixes must infer correctly —
    whole-column unification (the reference hard-errors on a NULL in
    the first row, auto_sql_transform.go:111-128)."""
    from analyst_spark.sources.literal import _frame

    df = _frame(spark, [[None, None], [1, "a"], [2.5, "b"]], ["x", "s"])
    assert dict(df.dtypes) == {"x": "double", "s": "string"}
    got = sorted(
        ((r.x, r.s) for r in df.collect()),
        key=lambda t: (t[0] is not None, t[0] or 0),
    )
    assert got == [(None, None), (1.0, "a"), (2.5, "b")]


def test_frame_all_null_column_and_mixed_to_string(spark):
    from analyst_spark.sources.literal import _frame

    df = _frame(spark, [[None, 1], [None, "x"]], ["empty", "mixed"])
    assert dict(df.dtypes) == {"empty": "string", "mixed": "string"}
    assert sorted(r.mixed for r in df.collect()) == ["1", "x"]


def test_frame_datetime_column(spark):
    from analyst_spark.sources.literal import _frame

    df = _frame(
        spark,
        [[datetime(2024, 1, 1, 10, 0)], [None]],
        ["t"],
    )
    assert dict(df.dtypes) == {"t": "timestamp"}


def test_http_source_distributed_live(spark, http_server):
    """Executor-side fetch: a DataFrame of URLs fanned out through
    mapInPandas (each worker fetches its batch of endpoints)."""
    from analyst_spark.sources.http import http_source_distributed

    urls = spark.createDataFrame(
        [(f"{http_server}?limit=100&offset=0",), (f"{http_server}?limit=2&offset=2",)],
        "url string",
    )
    df = http_source_distributed(
        spark, urls, columns=["id", "name"], json_path="data.rows"
    )
    got = sorted((r.id, r.name) for r in df.collect())
    # page 1: all 5; page 2: items 2,3 (duplicates expected — dedup is
    # the caller's concern)
    assert got == sorted(
        [(str(i), f"n{i}") for i in range(5)] + [("2", "n2"), ("3", "n3")]
    )


def test_split_by_destination_routing(spark):
    """Addressed rows reach only their consumer; NULL-destination rows
    broadcast to all (multiplexer wildcard semantics)."""
    from analyst_spark.sources.plugin import split_by_destination

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "n int, destination string"
    )
    parts = split_by_destination(df, ["a", "b"])
    assert sorted(r.n for r in parts["a"].collect()) == [1, 3]
    assert sorted(r.n for r in parts["b"].collect()) == [2, 3]
    assert parts["a"].columns == ["n"]


def test_jdbc_writer_bulk_strategy_per_driver():
    # sql_inserter.go:41-57 newSQLInserter: driver picks the bulk
    # strategy — MSSQL bulk copy (:99-124), Postgres rewrite (:127-171)
    from analyst_spark.sinks.jdbc import assemble_writer_options

    ms = assemble_writer_options(
        "jdbc:sqlserver://h:1433;databaseName=db", "t", driver="mssql"
    )
    assert ms["useBulkCopyForBatchInsert"] == "true"
    assert ms["driver"] == "com.microsoft.sqlserver.jdbc.SQLServerDriver"
    assert "reWriteBatchedInserts" not in ms

    pg = assemble_writer_options(
        "jdbc:postgresql://h/db", "t", driver="postgres", staging=True
    )
    assert pg["reWriteBatchedInserts"] == "true"
    assert pg["dbtable"] == "t_staging"
    assert "useBulkCopyForBatchInsert" not in pg

    lite = assemble_writer_options("jdbc:sqlite:f.db", "t", rows_per_batch=42)
    assert lite["batchsize"] == "42"
    assert "useBulkCopyForBatchInsert" not in lite
    assert "reWriteBatchedInserts" not in lite
