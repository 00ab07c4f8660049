"""Grammar-acceptance cases ported from the reference's parser tests
(aql/parser_test.go:366-650) — the same scripts, asserted against our
Block model."""

from __future__ import annotations

import os

from analyst_spark.aql.parser import parse_script


def _one(script, kind=None):
    blocks = parse_script(script, ".", None)
    if kind:
        return next(b for b in blocks if b.kind == kind)
    return blocks[-1]


def test_query_multi_sink_and_dependency():
    # parser_test.go:373-388 (case 1)
    b = _one("""
    QUERY 'name' FROM CONNECTION source (
        query_source()
    ) INTO CONNECTION destination, GLOBAL
    AFTER dependency
    """)
    assert b.name == "name"
    assert b.body.strip() == "query_source()"
    assert [(s.kind, s.name) for s in b.sources] == [("connection", "source")]
    assert [(s.kind, s.name) for s in b.sinks] == [
        ("connection", "destination"), ("global", None)]
    assert b.after == ["dependency"]


def test_query_mixed_global_and_block_sources():
    # parser_test.go:390-407 (case 2)
    b = _one("""
    QUERY 'name'
    FROM GLOBAL, BLOCK asdf (
        thing''
    ) INTO GLOBAL
    """)
    assert b.body.strip() == "thing''"
    assert [(s.kind, s.name) for s in b.sources] == [
        ("global", None), ("block", "asdf")]
    assert b.sinks[0].kind == "global"


def test_query_global_alias_and_options():
    # parser_test.go:409-431 (case 3)
    b = _one("""
    QUERY 'name'
    FROM GLOBAL AS 'source' (
        thing''
    ) INTO CONNECTION destination
    WITH (opt1 = 'val', opt2 = 1234)
    """)
    assert b.sources[0].kind == "global" and b.sources[0].alias == "source"
    assert b.options == {"OPT1": "val", "OPT2": 1234}


def test_transform_with_and_without_plugin():
    # parser_test.go:458-496 TestScript
    plain = _one("""
    TRANSFORM 'name' FROM CONNECTION source (
        query_source()
    ) INTO CONNECTION destination
    """)
    assert not plain.plugin and plain.body.strip() == "query_source()"
    plugin = _one("""
    TRANSFORM PLUGIN 'name' FROM CONNECTION source (
        query_source()
    ) INTO CONNECTION destination
    """)
    assert plugin.plugin and plugin.name == "name"


def test_test_block():
    # parser_test.go:498-515 TestTest
    b = _one("""
    TEST block_name WITH ASSERTIONS (
        query_source()
    );
    """)
    assert b.kind == "test"
    assert b.sources[0].name == "block_name"
    assert b.assertions_body.strip() == "query_source()"


def test_global_block():
    # parser_test.go:517-534 TestGlobal
    b = _one("GLOBAL 'name' (\n query_source()\n)")
    assert b.kind == "global" and b.name == "name"
    assert b.body.strip() == "query_source()"


def test_description_block():
    # parser_test.go:536-552 TestDescription
    b = _one("DESCRIPTION 'This is a\n    description'")
    assert b.kind == "description"
    assert b.body == "This is a\n    description"


def test_variables_declaration_and_parameter_sink():
    # parser_test.go:554-579 TestVariables
    blocks = parse_script("""
    DECLARE @TestVar;

    QUERY 'asdf' FROM GLOBAL (
        SELECT MAX(Time) AS 'Time' FROM Table
        WHERE Id > ?
    )
    USING PARAMETER TestParam
    INTO PARAMETER (@TestVar, @Test2)
    """, ".", None)
    decl = next(b for b in blocks if b.kind == "declare")
    assert decl.declares == ["@TestVar"]
    q = next(b for b in blocks if b.kind == "query")
    assert q.using_params == ["TestParam"]
    assert q.sinks[0].kind == "parameter"
    assert q.sinks[0].params == ["@TestVar", "@Test2"]


def test_set_numeric_global_option():
    # parser_test.go:581-592 TestGlobalOptions
    b = _one("SET Opt1 = 1.1")
    assert b.kind == "set" and b.key == "OPT1" and float(b.value) == 1.1


def test_connection_newline_separated_options():
    # parser_test.go:594-630 TestConnection — option list without
    # commas parses too
    b = _one("""
    CONNECTION 'test' (
        Driver = 'MSSQL'
        ConnectionString = 'asdf'
    )
    """)
    assert b.options == {"DRIVER": "MSSQL", "CONNECTIONSTRING": "asdf"}


def test_include_with_template_in_path(tmp_path):
    # parser_test.go:443-456 — INCLUDE '{{ .Source }}.txt'
    inc = tmp_path / "source.aql"
    inc.write_text("QUERY 'b' FROM GLOBAL (SELECT 1 AS x)")
    blocks = parse_script(
        "INCLUDE '{{ .Source }}.aql'", str(tmp_path), {"Source": "source"}
    )
    assert [(b.kind, b.name) for b in blocks] == [("query", "b")]


def test_multi_sink_lands_in_both(spark):
    # functional check of the comma-sink grammar: CONSOLE and GLOBAL
    from analyst_spark.aql.engine import execute_script

    res = execute_script(spark, """
    QUERY 'dual' FROM GLOBAL (
        SELECT 42 AS answer
    ) INTO CONSOLE, GLOBAL WITH (TABLE = 'Landed', OUTPUT_FORMAT = 'JSON')
    """)
    assert res.console == ['[{"answer":42}]']
    assert [r.answer for r in res.globals.get("Landed").collect()] == [42]
