"""End-to-end AQL script tests mirroring the reference's compiler
tests (compiler_test.go) — golden console output, GLOBAL round-trips,
parameters, AFTER sequencing, assertions, test mode, templating."""

import pytest

from analyst_spark.aql import execute_script
from analyst_spark.aql import test_script as run_test_mode
from analyst_spark.aql.assertions import AssertionFailure
from analyst_spark.aql.parser import parse_script


def test_parse_block_shapes():
    blocks = parse_script(
        """
        -- a comment
        CONNECTION 'Workbook' ( Driver = 'Excel', File = './x.xlsx' )
        /** block
            comment **/
        QUERY 'Q' FROM GLOBAL ( SELECT 1 AS 'Value' )
            INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON') AFTER A, B
        """
    )
    assert [b.kind for b in blocks] == ["connection", "query"]
    q = blocks[1]
    assert q.name == "Q" and q.sources[0].kind == "global"
    assert q.sinks[0].kind == "console"
    assert q.options["OUTPUT_FORMAT"] == "JSON"
    assert q.after == ["A", "B"]


def test_data_literal_golden_console(spark):
    # compiler_test.go:58-83 — expects exactly [{"Total":3}]
    script = """
    DATA 'Values' (
        [[1, "A"], [2, "B"]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'Number,Letter');

    TRANSFORM 'Total' FROM BLOCK Values (
        AGGREGATE SUM(Number) AS Total
    ) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')
    """
    res = execute_script(spark, script)
    assert res.console == ['[{"Total":3}]']


def test_global_roundtrip(spark):
    # compiler_test.go TestGlobal
    script = """
    GLOBAL 'InitializeInputTable' (
        CREATE TABLE test (
            ID Number,
            Name Text
        );
        INSERT INTO test (ID, Name) VALUES (1, 'Bob');
    )
    GLOBAL 'InitializeOutputTable' (
        CREATE TABLE test2 (
            ID Number,
            Name Text
        );
    )
    QUERY 'Test' FROM GLOBAL (
        SELECT * FROM test
    ) INTO GLOBAL WITH (TABLE = 'test2')
    """
    res = execute_script(spark, script)
    rows = res.globals.get("test2").collect()
    assert len(rows) == 1
    assert rows[0].ID == 1.0 and rows[0].Name == "Bob"


def test_exec_after_chain(spark):
    # compiler_test.go:647-667 shape: EXEC chain with AFTER ordering
    script = """
    EXEC 'CreateTables' FROM GLOBAL (
        CREATE TABLE Samples ( x int );
    );
    EXEC 'InsertOne' FROM GLOBAL (
        INSERT INTO Samples (x) VALUES (1);
    ) AFTER CreateTables;
    EXEC 'InsertTwo' FROM GLOBAL (
        INSERT INTO Samples (x) VALUES (2);
    ) AFTER InsertOne;
    QUERY 'Check' FROM GLOBAL (
        SELECT SUM(x) AS total FROM Samples
    ) INTO GLOBAL WITH (TABLE = 'out') AFTER InsertTwo
    """
    res = execute_script(spark, script)
    assert res.globals.get("out").collect()[0].total == 3


def test_parameters(spark):
    # compiler_test.go TestCompilerWithParameters shape
    script = """
    DECLARE @Id;
    GLOBAL 'Initialize' (
        CREATE TABLE Contacts ( id integer, first_name text );
        INSERT INTO Contacts (id, first_name) VALUES (1, 'Bob');
        INSERT INTO Contacts (id, first_name) VALUES (2, 'Steven');
    );
    QUERY 'GetId' FROM GLOBAL (
        SELECT 1 AS 'Id'
    ) INTO PARAMETER (@Id);
    QUERY 'GetName' FROM GLOBAL (
        SELECT first_name FROM Contacts WHERE id = ?
    )
    USING PARAMETER @Id
    INTO GLOBAL WITH (Table = 'Out')
    AFTER GetId
    """
    res = execute_script(spark, script)
    assert res.parameters["Id"] == 1
    assert res.globals.get("out").collect()[0].first_name == "Bob"


def test_assertions_pass_and_fail(spark):
    # compiler_test.go TestCompilerAssertions
    base = """
    DATA 'Values' (
        [["Hello, World"]{extra}]
    ) INTO CONSOLE WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'Word')

    TEST Values WITH ASSERTIONS (
        COLUMN Word HAS UNIQUE VALUES
    )
    """
    run_test_mode(spark, base.format(extra=""))
    with pytest.raises(AssertionFailure):
        run_test_mode(spark, base.format(extra=', ["Hello, World"]'))


def test_assertion_forms(spark):
    script = """
    DATA 'V' (
        [[1, "a"], [2, "b"], [3, "b"]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'N,S')
    TEST V WITH ASSERTIONS (
        IT OUTPUTS EXACTLY 3 ROWS;
        IT OUTPUTS AT LEAST 2 ROWS;
        COLUMN S HAS AT MOST 2 DISTINCT VALUES;
        COLUMN N HAS NO NULL VALUES;
        IT SATISFIES N >= 1
    )
    """
    run_test_mode(spark, script)
    bad = script.replace("N >= 1", "N >= 2")
    with pytest.raises(AssertionFailure):
        run_test_mode(spark, bad)


def test_test_mode_neutralizes_console(spark):
    script = """
    DATA 'Values' (
        [[1, "A"]]
    ) INTO CONSOLE WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'N,L')
    """
    res = run_test_mode(spark, script)
    assert res.console == []


def test_zoh_example2(spark):
    # example2.aql end-to-end with hand-computed expectations
    script = """
    GLOBAL 'CreateTables' (
        CREATE TABLE Timeseries (
            LoadId int not null,
            Variable text not null,
            Time  text not null,
            Value real
        );
        INSERT INTO Timeseries (LoadId, Variable, Time, Value)
         VALUES
         (1, 'power', '2017-12-01T11:59:00Z', 10),
         (1, 'power', '2017-12-01T12:13:01Z', 0),
         (1, 'power', '2017-12-01T12:57:00Z', 1.1),
         (2, 'power', '2017-12-01T11:52:00Z', 120),
         (2, 'power', '2017-12-01T11:45:00Z', 100),
         (3, 'power', '2017-12-01T12:33:00Z', 119),
         (3, 'power', '2017-12-01T12:20:00Z', 50),
         (3, 'power', '2017-12-01T11:59:00Z', 100),
         (1, 'temperature', '2017-12-01T11:59:00Z', 129.5),
         (1, 'temperature', '2017-12-01T12:13:01Z', 130.3);
    )
    TRANSFORM 'Resample' FROM GLOBAL (
        AGGREGATE LoadId, Variable, ZOH(Time, Value, '2017-12-01T12:00:00Z', '2017-12-01T12:30:00Z') As Value
        GROUP BY LoadId, Variable
    ) INTO CONSOLE
        WITH (Table = 'Timeseries', CONSOLE_OUTPUT_FORMAT='JSON')
    """
    res = execute_script(spark, script)
    got = {
        (r.LoadId, r.Variable): r.Value
        for r in res.frames["resample"].collect()
    }
    assert got[(1, "power")] == pytest.approx((781 * 10 + 1019 * 0) / 1800)
    assert got[(2, "power")] == pytest.approx(120.0)
    assert got[(3, "power")] == pytest.approx((1200 * 100 + 600 * 50) / 1800)
    assert got[(1, "temperature")] == pytest.approx(
        (781 * 129.5 + 1019 * 130.3) / 1800
    )


def test_templating(spark):
    script = """
    GLOBAL 'T' (
        CREATE TABLE ts ( t text, v real );
        INSERT INTO ts (t, v) VALUES ('2017-01-01T12:00:00Z', 0), ('2017-01-01T12:20:00Z', 3);
    )
    TRANSFORM 'R' FROM GLOBAL (
        AGGREGATE ZOH(t, v, '{{ .Start }}', '{{ .Finish }}') AS m
    ) WITH (Table = 'ts') INTO CONSOLE
    """
    res = execute_script(
        spark, script,
        options={"Start": "2017-01-01T12:00:00Z", "Finish": "2017-01-01T12:30:00Z"},
    )
    assert res.frames["r"].collect()[0].m == pytest.approx(1.0)


def test_lookup_transform(spark):
    # docs/transforms.md LOOKUP example via DATA blocks
    script = """
    DATA 'LookupTable' (
        [[1, "Bob"], [2, "John"], [3, "Steve"]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'id,first_name');
    DATA 'BaseTable' (
        [[1, "Bobbertson"], [2, "Johnson"]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'lookup_id,last_name');
    TRANSFORM 'Joined' FROM BLOCK BaseTable, BLOCK LookupTable (
        LOOKUP BaseTable.lookup_id, first_name, last_name
        FROM BaseTable INNER JOIN LookupTable ON BaseTable.lookup_id = LookupTable.id
    ) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')
    """
    res = execute_script(spark, script)
    rows = {r.lookup_id: (r.first_name, r.last_name)
            for r in res.frames["joined"].collect()}
    assert rows == {1: ("Bob", "Bobbertson"), 2: ("John", "Johnson")}


def test_multisource_union(spark):
    script = """
    DATA 'A' ( [[1]] ) WITH (FORMAT='JSON_ARRAY', COLUMNS='x');
    DATA 'B' ( [[2]] ) WITH (FORMAT='JSON_ARRAY', COLUMNS='x');
    TRANSFORM 'Sum' FROM BLOCK A, BLOCK B (
        AGGREGATE SUM(x) AS total
    ) INTO CONSOLE WITH (OUTPUT_FORMAT='JSON')
    """
    res = execute_script(spark, script)
    assert res.console == ['[{"total":3}]']


def test_csv_literal_all_strings(spark):
    script = """
    DATA 'C' (
        1,a
        2,b
    ) WITH (FORMAT='CSV', COLUMNS='n,s') INTO CONSOLE WITH (OUTPUT_FORMAT='JSON')
    """
    res = execute_script(spark, script)
    assert res.console == ['[{"n":"1","s":"a"},{"n":"2","s":"b"}]']


def test_connection_source_injection(spark):
    # CONNECTION-backed QUERY: source staged as temp view, SQL runs on
    # Spark (the AutoSQL path, engine/auto_sql_transform.go:21-30)
    def fake_excel(spk, options):
        return spk.createDataFrame([(1, "x"), (2, "y")], ["id", "val"])

    script = """
    CONNECTION 'Workbook' ( Driver = 'Excel', File = './x.xlsx' )
    QUERY 'Q' FROM CONNECTION Workbook AS wb (
        SELECT val FROM wb WHERE id = 2
    ) INTO CONSOLE WITH (OUTPUT_FORMAT='JSON')
    """
    res = execute_script(spark, script, connections={"workbook": fake_excel})
    assert res.console == ['[{"val":"y"}]']


def test_asof_transform(spark):
    # engine extension: ASOF transform joins each base row to the
    # latest right row at-or-before its timestamp, per key
    script = """
    DATA 'Trades' (
        [[1, "A", "2024-01-01T10:05:00"], [2, "A", "2024-01-01T10:30:00"],
         [3, "B", "2024-01-01T10:10:00"]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'TradeId,Sym,ts');

    DATA 'Quotes' (
        [[ "A", "2024-01-01T10:00:00", 100], ["A", "2024-01-01T10:20:00", 101],
         [ "B", "2024-01-01T11:00:00", 200]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'Sym,ts,Px');

    TRANSFORM 'WithQuote' FROM BLOCK Trades, BLOCK Quotes (
        ASOF Px AS LastPx FROM Trades JOIN Quotes ON Trades.Sym = Quotes.Sym
    ) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')
    """
    res = execute_script(spark, script)
    import json

    rows = {r["TradeId"]: r["LastPx"] for r in json.loads(res.console[0])}
    assert rows == {1: 100, 2: 101, 3: None}


def test_fan_out_block_is_persisted_then_released(spark):
    """A block with two consumers gets the multiplexer treatment:
    persisted during the job (each sink replays cached partitions),
    unpersisted afterwards."""
    script = """
    DATA 'Vals' (
        [[1], [2], [3]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'N');

    TRANSFORM 'TotA' FROM BLOCK Vals (
        AGGREGATE SUM(N) AS Total
    ) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON');

    TRANSFORM 'TotB' FROM BLOCK Vals (
        AGGREGATE COUNT(1) AS Cnt
    ) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')
    """
    res = execute_script(spark, script)
    assert sorted(res.console) == ['[{"Cnt":3}]', '[{"Total":6}]']
    # fan-out frame released after the job
    assert res.frames["vals"].storageLevel.useMemory is False


def test_include_composes_scripts(spark, tmp_path):
    """INCLUDE inlines another script file (aql/parser.go:792-813,
    max depth 8)."""
    (tmp_path / "data.aql").write_text(
        "DATA 'Vals' ([[5], [6]]) "
        "WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'N');"
    )
    script = """
    INCLUDE 'data.aql';

    TRANSFORM 'Tot' FROM BLOCK Vals (
        AGGREGATE SUM(N) AS Total
    ) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')
    """
    res = execute_script(spark, script, script_dir=str(tmp_path))
    assert res.console == ['[{"Total":11}]']


def test_include_depth_limit(spark, tmp_path):
    (tmp_path / "loop.aql").write_text("INCLUDE 'loop.aql';")
    with pytest.raises(SyntaxError):
        execute_script(spark, "INCLUDE 'loop.aql';", script_dir=str(tmp_path))


def test_cli_run_and_validate(spark, tmp_path, capsys):
    """tools/run_aql.py — the `analyst run`/`validate` analog
    (cmd/main.go:15-88) driven in-process."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from run_aql import main

    script = tmp_path / "job.aql"
    script.write_text(
        "DATA 'V' ([[1], [2]]) WITH (FORMAT='JSON_ARRAY', COLUMNS='N');\n"
        "TRANSFORM 'T' FROM BLOCK V (AGGREGATE SUM(N) AS Total)\n"
        "INTO CONSOLE WITH (OUTPUT_FORMAT='JSON');\n"
        "TEST T WITH ASSERTIONS (IT OUTPUTS EXACTLY 1 ROWS)"
    )
    assert main(["validate", str(script)]) == 0
    assert main(["run", str(script), "--cpus", "8"]) == 0
    out = capsys.readouterr().out
    assert '[{"Total":3}]' in out
    assert main(["test", str(script), "--cpus", "8"]) == 0
    assert "TESTS PASSED" in capsys.readouterr().out


def test_set_template_var_with_cli_options(spark):
    # ADVICE r1: a SET-defined template variable must render even when
    # CLI options are also passed (the first parse used to apply
    # templates with only the CLI dict and KeyError on the SET var).
    script = """
    SET Metric = 'v';
    GLOBAL 'T' (
        CREATE TABLE ts ( t text, v real );
        INSERT INTO ts (t, v) VALUES ('a', 1), ('b', 3);
    )
    QUERY 'R' FROM GLOBAL (
        SELECT sum({{ .Metric }}) AS total FROM ts
    ) INTO GLOBAL WITH (Table = 'Out')
    """
    res = execute_script(spark, script, options={"Unrelated": "x"})
    assert res.globals.get("out").collect()[0].total == 4.0


def test_question_mark_inside_string_literal_not_a_placeholder(spark):
    # ADVICE r1: '?' inside a quoted literal must not count as a
    # USING PARAMETER placeholder.
    script = """
    DECLARE @Id;
    GLOBAL 'Init' (
        CREATE TABLE notes ( id integer, note text );
        INSERT INTO notes (id, note) VALUES (1, 'why?'), (2, 'ok');
    );
    QUERY 'GetId' FROM GLOBAL (
        SELECT 1 AS 'Id'
    ) INTO PARAMETER (@Id);
    QUERY 'Q' FROM GLOBAL (
        SELECT note FROM notes WHERE note = 'why?' AND id = ?
    )
    USING PARAMETER @Id
    INTO GLOBAL WITH (Table = 'Out')
    AFTER GetId
    """
    res = execute_script(spark, script)
    assert [r.note for r in res.globals.get("out").collect()] == ["why?"]


def test_find_overridable_option_reference_cases():
    # ported from aql/parser_test.go TestFindOverridableOption
    from analyst_spark.aql.parser import find_overridable_option

    opts = {"asdf_O1": 1.0, "O2": 2.0}
    opts2 = {"O1": 3.0, "O3": 4.0}
    v, ok = find_overridable_option("O3", "", opts, opts2)
    assert ok and v == 4.0
    # namespaced key in the FIRST level beats the generic in the second
    v, ok = find_overridable_option("O1", "ASDF", opts, opts2)
    assert ok and v == 1.0
    # generic fallback within a level
    v, ok = find_overridable_option("O2", "ASDF", opts, opts2)
    assert ok and v == 2.0
    v, ok = find_overridable_option("MISSING", "ASDF", opts, opts2)
    assert not ok and v is None


def test_truthy_reference_cases():
    # ported from aql/parser_test.go TestTruthy: nonzero numbers and
    # 'true' strings only
    from analyst_spark.aql.parser import truthy

    assert truthy(1.0) and truthy(-2) and truthy("true") and truthy("TRUE")
    assert not truthy(0) and not truthy("false")
    assert not truthy("1") and not truthy("yes") and not truthy(None)


def test_namespace_override_reaches_connection_sink(spark):
    # block-level EXCELA_SHEET overrides the connection's SHEET for
    # destination ExcelA only; destination B sees the generic value
    from analyst_spark.aql.engine import execute_script

    seen = {}

    def mk_writer(name):
        def write(df, options):
            seen[name] = options.get("SHEET")
        return write

    script = """
    DATA 'D' (
        [[1]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'k', EXCELA_SHEET = 'Override')
    INTO CONNECTION ExcelA
    DATA 'D2' (
        [[2]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'k')
    INTO CONNECTION B
    """
    execute_script(
        spark, script,
        connections={"excela.write": mk_writer("ExcelA"), "b.write": mk_writer("B")},
        connection_options={"ExcelA": {"SHEET": "ConnSheet"}, "B": {"SHEET": "BSheet"}},
    )
    assert seen["ExcelA"] == "Override"  # block namespaced > connection
    assert seen["B"] == "BSheet"


def test_option_precedence_block_conn_cli_set(spark):
    # full chain: block > connection > job tier, where script SET
    # overrides same-named CLI options (compiler.go:239-268)
    from analyst_spark.aql.engine import execute_script

    seen = {}

    def write(df, options):
        seen.update(options)

    base = """
    SET FromSet = 'set';
    SET Overridden = 'set';
    DATA 'D' (
        [[1]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'k', BlockOpt = 'block')
    INTO CONNECTION C
    """
    execute_script(
        spark, base,
        options={"CliOpt": "cli", "Overridden": "cli"},
        connections={"c.write": write},
        connection_options={"C": {"ConnOpt": "conn", "CLIOPT": "conn-shadow"}},
    )
    assert seen["BLOCKOPT"] == "block"
    # connection tier beats CLI tier
    assert seen["CLIOPT"] == "conn-shadow"
    assert seen["CONNOPT"] == "conn"
    # script SET overrides the same-named CLI option
    assert seen["OVERRIDDEN"] == "set"
    assert seen["FROMSET"] == "set"


def test_translate_sql_sqlite_isms():
    from analyst_spark.aql.engine import translate_sql

    assert translate_sql("SELECT 1 AS 'Id'") == "SELECT 1 AS `Id`"
    assert (
        translate_sql("SELECT strftime('%Y-%m-%d', t) FROM x")
        == "SELECT date_format(to_timestamp(t), 'yyyy-MM-dd') FROM x"
    )
    assert (
        translate_sql("SELECT strftime('%s', t) FROM x")
        == "SELECT CAST(to_unix_timestamp(t) AS STRING) FROM x"
    )
    assert (
        translate_sql("SELECT datetime('2017-01-01T12:00:00Z') AS d")
        == "SELECT date_format(to_timestamp('2017-01-01T12:00:00Z'), "
           "'yyyy-MM-dd HH:mm:ss') AS d"
    )
    assert (
        translate_sql("SELECT julianday(t) - julianday(s) FROM x")
        == "SELECT (to_unix_timestamp(t) / 86400.0 + 2440587.5) - "
           "(to_unix_timestamp(s) / 86400.0 + 2440587.5) FROM x"
    )
    assert (
        translate_sql("SELECT group_concat(name) FROM x")
        == "SELECT array_join(collect_list(name), ',') FROM x"
    )
    assert (
        translate_sql("SELECT group_concat(DISTINCT name, '; ') FROM x")
        == "SELECT array_join(collect_set(name), '; ') FROM x"
    )
    # things Spark speaks natively pass through untouched
    for native in (
        "SELECT IFNULL(a, 0), b || c FROM x",
        "SELECT date(t) FROM x",
        "SELECT CAST(a AS INTEGER) FROM x",
    ):
        assert translate_sql(native) == native


def test_sqlite_dialect_queries_run_on_spark(spark):
    # the dialect corpus end-to-end: a GLOBAL table queried with
    # SQLite-isms produces the SQLite answers
    script = """
    GLOBAL 'T' (
        CREATE TABLE ev ( name text, t text );
        INSERT INTO ev (name, t) VALUES
          ('a', '2017-12-01T11:59:00Z'),
          ('b', '2017-12-01T12:13:01Z'),
          ('a', '2017-12-02T09:00:00Z');
    )
    QUERY 'Q' FROM GLOBAL (
        SELECT strftime('%Y-%m-%d', t) AS 'Day',
               group_concat(name, '+') AS 'Names',
               IFNULL(NULL, 'x') || '!' AS 'Concat'
        FROM ev GROUP BY strftime('%Y-%m-%d', t) ORDER BY Day
    ) INTO GLOBAL WITH (Table = 'Out')
    """
    res = execute_script(spark, script)
    rows = [(r.Day, r.Names, r.Concat) for r in res.globals.get("out").collect()]
    assert rows == [
        ("2017-12-01", "a+b", "x!"),
        ("2017-12-02", "a", "x!"),
    ]


def test_multisource_order_sequential_honored(spark):
    # compiler_test.go:556-607 (Multisource_Order = 'Sequential'):
    # rows of source i precede rows of source i+1 at the sink
    got = []
    script = """
    DATA 'SliceOfData' ( [[1], [-1], [2]] )
    WITH (FORMAT='JSON_ARRAY', COLUMNS='Value');
    DATA 'SliceOfData2' ( [[10], [11], [-2]] )
    WITH (FORMAT='JSON_ARRAY', COLUMNS='Value');
    TRANSFORM 'All' FROM BLOCK SliceOfData, BLOCK SliceOfData2 (
        APPLY Value
    ) INTO CONNECTION Sink
    WITH (Multisource_Order = 'Sequential')
    """
    execute_script(
        spark, script,
        connections={"sink.write": lambda df, o: got.extend(
            r.Value for r in df.collect())},
    )
    assert got == [1, -1, 2, 10, 11, -2]


def test_multisource_order_parallel_accepted(spark):
    script = """
    DATA 'A' ( [[1]] ) WITH (FORMAT='JSON_ARRAY', COLUMNS='x');
    DATA 'B' ( [[2]] ) WITH (FORMAT='JSON_ARRAY', COLUMNS='x');
    TRANSFORM 'Sum' FROM BLOCK A, BLOCK B (
        AGGREGATE SUM(x) AS total
    ) INTO CONSOLE WITH (OUTPUT_FORMAT='JSON', MULTISOURCE_ORDER='PARALLEL')
    """
    res = execute_script(spark, script)
    assert res.console == ['[{"total":3}]']


def test_multisource_order_invalid_value_is_compile_error(spark):
    from analyst_spark.aql.engine import validate_script

    script = """
    DATA 'A' ( [[1]] ) WITH (FORMAT='JSON_ARRAY', COLUMNS='x');
    DATA 'B' ( [[2]] ) WITH (FORMAT='JSON_ARRAY', COLUMNS='x');
    TRANSFORM 'Sum' FROM BLOCK A, BLOCK B (
        AGGREGATE SUM(x) AS total
    ) INTO CONSOLE WITH (MULTISOURCE_ORDER='ZIGZAG')
    """
    with pytest.raises(ValueError, match="PARALLEL or SEQUENTIAL"):
        validate_script(script)
    with pytest.raises(ValueError, match="PARALLEL or SEQUENTIAL"):
        execute_script(spark, script)


def test_lookup_order_by_option_last_wins(spark):
    # AQL-level ORDER_BY: duplicate lookup keys resolve to the row
    # with the greatest ORDER_BY value, with no Python API involvement
    # (reference lookup.go:185-188 last-wins, made deterministic)
    got = []
    script = """
    DATA 'Base' ( [[1, "x"], [2, "y"]] )
    WITH (FORMAT='JSON_ARRAY', COLUMNS='id,tag');
    DATA 'Prices' ( [[1, 100, 5], [1, 200, 9], [2, 300, 1], [2, 250, 4]] )
    WITH (FORMAT='JSON_ARRAY', COLUMNS='pid,price,version');
    TRANSFORM 'Enriched' FROM BLOCK Base, BLOCK Prices (
        LOOKUP Base.id, price FROM Base INNER JOIN Prices ON Base.id = Prices.pid
    ) INTO CONNECTION Sink
    WITH (ORDER_BY = 'version')
    """
    execute_script(
        spark, script,
        connections={"sink.write": lambda df, o: got.extend(
            sorted((r.id, r.price) for r in df.collect()))},
    )
    # id 1: version 9 row wins (price 200); id 2: version 4 row wins (250)
    assert got == [(1, 200), (2, 250)]


def test_dedup_transform(spark):
    """Engine-extension DEDUP transform: one survivor per key by an
    explicit order column, FIRST and LAST, end to end in a script."""
    script = """
    DATA 'raw' (
        [[1, "a", 10], [2, "a", 20], [3, "b", 5], [4, "a", 15]]
    ) WITH (COLUMNS = 'id, k, v')

    TRANSFORM 'first' FROM BLOCK raw (
        DEDUP ON k KEEP FIRST BY id
    ) INTO GLOBAL WITH (TABLE = 'kept_first')

    TRANSFORM 'last' FROM BLOCK raw (
        DEDUP ON k KEEP LAST BY id
    ) INTO GLOBAL WITH (TABLE = 'kept_last')
    """
    res = execute_script(spark, script)
    first = {r.k: (r.id, r.v) for r in res.globals.get("kept_first").collect()}
    last = {r.k: (r.id, r.v) for r in res.globals.get("kept_last").collect()}
    assert first == {"a": (1, 10), "b": (3, 5)}
    assert last == {"a": (4, 15), "b": (3, 5)}


def test_dedup_transform_grammar_errors(spark):
    from analyst_spark.aql.transforms_parser import parse_dedup

    import pytest as _pytest

    for bad in ("DEDUP k KEEP FIRST BY id",        # missing ON
                "DEDUP ON k BY id",                # missing KEEP
                "DEDUP ON k KEEP SOMETIMES BY id", # bad mode
                "DEDUP ON k KEEP FIRST"):          # missing BY
        with _pytest.raises(SyntaxError):
            parse_dedup(bad)


def test_dedup_transform_case_insensitive_keys(spark):
    """AQL identifiers are case-insensitive: DEDUP ON K over a frame
    with column k must not duplicate the key into the payload."""
    script = """
    DATA 'raw' (
        [[1, "a", 10], [2, "a", 20]]
    ) WITH (COLUMNS = 'id, k, v')

    TRANSFORM 'd' FROM BLOCK raw (
        DEDUP ON K KEEP LAST BY ID
    ) INTO GLOBAL WITH (TABLE = 'out')
    """
    out = execute_script(spark, script).globals.get("out")
    assert sorted(out.columns) == ["id", "k", "v"]
    assert [(r.k, r.id, r.v) for r in out.collect()] == [("a", 2, 20)]


def test_exec_using_parameter_on_global(spark):
    """r7: EXEC FROM GLOBAL also binds USING PARAMETER."""
    script = """
    DECLARE @V;
    GLOBAL 'Init' (
        CREATE TABLE ep ( x integer );
    );
    QUERY 'GetV' FROM GLOBAL (
        SELECT 41 + 1 AS v
    ) INTO PARAMETER (@V);
    EXEC 'Ins' FROM GLOBAL (
        INSERT INTO ep (x) VALUES (?)
    ) USING PARAMETER @V
    AFTER GetV;
    QUERY 'Out' FROM GLOBAL (
        SELECT x FROM ep
    ) INTO GLOBAL WITH (Table = 'Out')
    AFTER Ins
    """
    res = execute_script(spark, script)
    assert [r.x for r in res.globals.get("out").collect()] == [42]


def test_query_from_block_runs_sql_over_block_output(spark):
    """r7 parity fix: QUERY ... FROM BLOCK b (sql) runs the SQL over
    the upstream block's output (reference: AutoSQL staging into
    SQLite, docs query.md "Non-database sources") — previously the
    body was silently discarded."""
    script = """
    DATA 'Vals' (
        [[1, "a"], [2, "b"], [3, "a"]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'n,k')

    QUERY 'Agg' FROM BLOCK Vals (
        SELECT k, sum(n) AS total FROM vals GROUP BY k
    ) INTO GLOBAL WITH (Table = 'Out')
    """
    res = execute_script(spark, script)
    got = {(r.k, r.total) for r in res.globals.get("out").collect()}
    assert got == {("a", 4), ("b", 2)}


def test_query_from_block_alias_and_params(spark):
    """The block view is named by its AS alias, and USING PARAMETER
    binds in the body."""
    script = """
    DECLARE @Min;
    DATA 'Numbers' (
        [[1], [5], [9]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'n')

    QUERY 'GetMin' FROM GLOBAL (
        SELECT 4 AS m
    ) INTO PARAMETER (@Min);

    QUERY 'Big' FROM BLOCK Numbers AS Nums (
        SELECT n FROM nums WHERE n > ?
    )
    USING PARAMETER @Min
    INTO GLOBAL WITH (Table = 'Out')
    AFTER GetMin
    """
    res = execute_script(spark, script)
    assert sorted(r.n for r in res.globals.get("out").collect()) == [5, 9]


def test_into_block_rejected_with_reference_diagnostic(spark):
    """compiler.go:1366-1368: BLOCK destinations are a compile error
    in the reference; we reject with the same rationale."""
    script = """
    DATA 'Vals' (
        [[1]]
    ) WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'n')
    INTO BLOCK Other
    """
    with pytest.raises(ValueError, match="non-deterministic source orders"):
        execute_script(spark, script)
