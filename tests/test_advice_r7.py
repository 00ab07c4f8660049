"""Round-7 advisor-item regressions (ADVICE.md r6):

1. pgwire.quote_literal on non-finite floats — must emit postgres-
   parseable quoted special literals, not bare nan/inf identifiers.
2. PgConnection.write identifier quoting — mixed-case / reserved-word
   table and column names (quote_ident, '"' with '""' doubling).
3. ParameterTable.clear()/popitem() — inherited dict methods left the
   canonical index stale, after which get(key, default) raised.
4. PgConnection.source on a no-resultset body — clear ValueError (the
   live-pg twin lives in test_pgwire.py).
5. server drain_pending — read1() returning None on a spurious
   would-block (select said readable, readiness evaporated) is NOT
   EOF and must not close a healthy websocket session.
"""

from __future__ import annotations

import math
import socket

import pytest

from analyst_spark.sources.pgwire import (
    copy_text_value,
    quote_ident,
    quote_literal,
)


# ---- 1. non-finite float literals -------------------------------------------

def test_quote_literal_nonfinite_floats():
    assert quote_literal(float("nan")) == "'NaN'::float8"
    assert quote_literal(float("inf")) == "'Infinity'::float8"
    assert quote_literal(float("-inf")) == "'-Infinity'::float8"
    # finite floats unchanged
    assert quote_literal(2.5) == "2.5"


def test_quote_literal_rejects_nul_clearly():
    with pytest.raises(ValueError, match="NUL"):
        quote_literal("a\x00b")


# ---- 2. identifier quoting --------------------------------------------------

def test_quote_ident_forms():
    # r8 (r7 advice follow-up): bare-legal names are emitted VERBATIM
    # so they case-fold like the reference's DefaultInserter
    # (sql_inserter.go Statement() emits identifiers unquoted) —
    # TABLE='MyTable' must keep matching a lowercase-stored table.
    assert quote_ident("MixedCase") == "MixedCase"
    assert quote_ident("simple") == "simple"
    assert quote_ident("public.Out") == "public.Out"
    # names that cannot stand bare still get quoted
    assert quote_ident("order") == '"order"'  # reserved word
    assert quote_ident('we"ird') == '"we""ird"'
    assert quote_ident("has space") == '"has space"'
    assert quote_ident("1starts_digit") == '"1starts_digit"'
    # r9 (r8 advice): a segment the user pre-quoted is the
    # always-quote escape hatch and passes through verbatim
    # (test_advice_r9.py covers the full matrix).
    assert quote_ident('public."quoted"') == 'public."quoted"'


def test_copy_text_value_encoding():
    assert copy_text_value(None) == "\\N"
    assert copy_text_value(True) == "t"
    assert copy_text_value(False) == "f"
    assert copy_text_value("a\tb\nc\\d") == "a\\tb\\nc\\\\d"
    assert copy_text_value(float("nan")) == "NaN"
    assert copy_text_value(float("-inf")) == "-Infinity"
    assert copy_text_value(3) == "3"
    with pytest.raises(ValueError, match="NUL"):
        copy_text_value("x\x00")


# ---- 3. ParameterTable.clear()/popitem() ------------------------------------

def test_parameter_table_clear_resyncs_index():
    from analyst_spark.sinks.parameter import ParameterTable

    pt = ParameterTable()
    pt.declare("Aa")
    pt["AA"] = 1
    pt.clear()
    assert len(pt) == 0
    assert pt.get("aa", "dflt") == "dflt"  # raised KeyError before fix
    assert "Aa" not in pt
    pt.declare("Aa")  # re-declaration after clear is legal again
    pt["aa"] = 2
    assert pt["AA"] == 2


def test_parameter_table_popitem_resyncs_index():
    from analyst_spark.sinks.parameter import ParameterTable

    pt = ParameterTable()
    pt.declare("Only")
    pt["only"] = 7
    k, v = pt.popitem()
    assert (k, v) == ("Only", 7)
    assert pt.get("ONLY", None) is None
    assert "only" not in pt


# ---- 5. drain_pending: None (would-block) vs b'' (EOF) ----------------------

class _FakeRfile:
    def __init__(self, results):
        self._results = list(results)

    def read1(self, n):
        return self._results.pop(0) if self._results else b""


def test_drain_none_is_would_block_not_eof():
    """select reports readable (peer wrote a byte we never consume at
    the socket level) but read1 returns None — the old code returned
    EOF and killed the session; must return True (stay alive)."""
    from analyst_spark.server import _drain_nonblocking

    a, b = socket.socketpair()
    try:
        b.sendall(b"x")  # make select() on `a` report readable
        buf = bytearray()
        assert _drain_nonblocking(a, _FakeRfile([None]), buf) is True
        assert buf == bytearray()
    finally:
        a.close()
        b.close()


def test_drain_empty_read_on_readable_socket_is_eof():
    from analyst_spark.server import _drain_nonblocking

    a, b = socket.socketpair()
    try:
        b.sendall(b"x")
        buf = bytearray()
        assert _drain_nonblocking(a, _FakeRfile([b""]), buf) is False
    finally:
        a.close()
        b.close()


def test_drain_collects_buffered_bytes_then_idles():
    from analyst_spark.server import _drain_nonblocking

    a, b = socket.socketpair()
    try:
        buf = bytearray()
        # nothing pending at socket level: read-ahead bytes drain,
        # then the not-readable socket means "no more for now" = True
        assert (
            _drain_nonblocking(a, _FakeRfile([b"abc", b"de", None]), buf)
            is True
        )
        assert bytes(buf) == b"abcde"
    finally:
        a.close()
        b.close()


def test_nonfinite_float_roundtrip_model():
    """The emitted literal is the documented postgres input form for
    float8 specials (datatype-numeric docs): quoted string + cast."""
    lit = quote_literal(float("nan"))
    assert lit.startswith("'") and lit.endswith("::float8")
    assert math.isnan(float(lit.split("'")[1]))
