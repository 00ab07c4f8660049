"""AQL parser robustness: any input — truncated, spliced, or random
token soup — must either parse or raise SyntaxError. Anything else
(IndexError, AttributeError, ...) is a crash bug; the reference's
hand-rolled lexer/parser has the same total-function contract."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from analyst_spark.aql.parser import parse_script

_VALID = """
CONNECTION 'db' (DRIVER = 'sqlite3', CONNECTIONSTRING = ':memory:')

QUERY 'fetch' FROM CONNECTION db (
    SELECT 1 AS a
) INTO CONSOLE WITH (OUTPUT_FORMAT = 'JSON')

DATA 'lit' (
    [[1,2]]
) INTO CONSOLE

TRANSFORM 'agg' FROM BLOCK fetch (
    AGGREGATE a, SUM(a) AS s GROUP BY a
) INTO CONSOLE

GLOBAL 'g' (
    CREATE TABLE t (x INT);
)

SET X = 'y'

EXEC 'e' FROM CONNECTION db (
    SELECT 2
)
"""

_KEYWORDS = [
    "QUERY", "TRANSFORM", "DATA", "EXEC", "GLOBAL", "CONNECTION", "SET",
    "INCLUDE", "DESCRIPTION", "TEST", "AFTER", "FROM", "INTO", "WITH",
    "EXTERN", "BLOCK", "CONSOLE", "PARAMETER", "(", ")", "'q'", "=", ",",
    "'x'", "1", "(\n SELECT 1 \n)", "GLOBAL", "A = 'b'",
]


def _check(text: str) -> None:
    try:
        parse_script(text)
    except (SyntaxError, OSError):
        pass  # clean rejection (OSError: INCLUDE/EXTERN touch files)


@given(st.integers(0, len(_VALID)), st.integers(0, len(_VALID)))
@settings(max_examples=80, deadline=None)
def test_truncations_and_splices(a, b):
    _check(_VALID[:a])
    _check(_VALID[:a] + _VALID[b:])


@given(st.lists(st.sampled_from(_KEYWORDS), min_size=0, max_size=12),
       st.sampled_from([" ", "\n"]))
@settings(max_examples=120, deadline=None)
def test_token_soup(tokens, sep):
    _check(sep.join(tokens))


@given(st.text(alphabet="QT'()=,\n \"$[]{}<>/*-0aZ", max_size=60))
@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.filter_too_much])
def test_character_noise(s):
    _check(s)


def test_valid_script_still_parses():
    blocks = parse_script(_VALID)
    assert [b.kind for b in blocks] == [
        "connection", "query", "data", "transform", "global", "set", "exec"
    ]


# ------------------------------------------- transform sub-grammars

from analyst_spark.aql.transforms_parser import (
    parse_aggregate,
    parse_apply,
    parse_asof,
    parse_lookup,
)

_AGG = "AGGREGATE a, SUM(x) AS s, QUANTILE(y, 0.5) AS q GROUP BY a"
_LOOKUP = "LOOKUP lk.v FROM base INNER JOIN lk ON base.k = lk.k"
_APPLY = "APPLY CAST(a AS INT) AS b, c"
_ASOF = "ASOF v AS w FROM base JOIN lk ON base.k = lk.k TIME t"

_SUB_TOKENS = [
    "SUM", "(", ")", "AS", ",", "GROUP", "BY", "FROM", "INNER", "OUTER",
    "JOIN", "ON", "=", ".", "CAST", "QUANTILE", "0.5", "x", "base", "lk",
    "ASOF", "TIME", "'q'",
]


def _check_sub(fn, text):
    try:
        fn(text)
    except SyntaxError:
        pass


@given(st.integers(0, 60), st.integers(0, 60),
       st.sampled_from(["agg", "lookup", "apply", "asof"]))
@settings(max_examples=120, deadline=None)
def test_transform_truncations(a, b, which):
    fn, base = {
        "agg": (parse_aggregate, _AGG),
        "lookup": (parse_lookup, _LOOKUP),
        "apply": (parse_apply, _APPLY),
        "asof": (parse_asof, _ASOF),
    }[which]
    _check_sub(fn, base[:a])
    _check_sub(fn, base[:a] + base[b:])


@given(st.lists(st.sampled_from(_SUB_TOKENS), min_size=0, max_size=10),
       st.sampled_from(["agg", "lookup", "apply", "asof"]))
@settings(max_examples=160, deadline=None)
def test_transform_token_soup(tokens, which):
    # (bases must be valid grammar or the truncation fuzz is vacuous)
    fn = {
        "agg": parse_aggregate,
        "lookup": parse_lookup,
        "apply": parse_apply,
        "asof": parse_asof,
    }[which]
    _check_sub(fn, " ".join(tokens))


def test_transform_bases_are_valid():
    assert parse_aggregate(_AGG)[1] == ["a"]
    assert parse_lookup(_LOOKUP).base == "base"
    assert parse_apply(_APPLY)[0][0] == "a"
    assert parse_asof(_ASOF).base == "base"
