"""Round-9 advisor items (ADVICE.md after round 8), each pinned:

1. verify_local's CMS band imports the entry's own _CMS_EPS instead
   of duplicating the literal (drift hazard).
2. quote_ident grows an always-quote escape hatch: a pre-quoted
   segment ('"MyTable"') is emitted verbatim, so pre-r8 AQL configs
   addressing quoted mixed-case objects keep a migration path.
3. retrieval.py: ln-parity assumption documented + boundary guard
   (tests/test_bm25.py::test_idf_micro_half_boundary_margin);
   docstring arithmetic claims match the code (DECIMAL(28,0)
   intermediates, BIGINT final sum).
4. tds.bulk_row raises a clear ValueError naming the column for
   non-Latin-1 varchar values instead of a deep UnicodeEncodeError.
"""

import inspect

from analyst_spark.sources.pgwire import quote_ident
from analyst_spark.sources import tds


def test_verify_local_cms_band_shares_entry_eps():
    import tools.verify_local as vl

    src = inspect.getsource(vl._check_heavy_hitters_cms)
    assert "_CMS_EPS" in src, "band must import the entry's own eps"
    assert "eps = 1e-4" not in src, "duplicated literal reintroduced"


def test_quote_ident_prequoted_escape_hatch():
    # The escape hatch: user passes the quotes, we emit verbatim.
    assert quote_ident('"MyTable"') == '"MyTable"'
    assert quote_ident('public."MyTable"') == 'public."MyTable"'
    assert quote_ident('"My""Quoted"') == '"My""Quoted"'
    # A pre-quoted segment may itself contain a dot.
    assert quote_ident('"My.Table"') == '"My.Table"'
    assert quote_ident('s."My.Table"') == 's."My.Table"'
    # Unchanged r7/r8 behavior for everything else.
    assert quote_ident("MixedCase") == "MixedCase"
    assert quote_ident("order") == '"order"'
    assert quote_ident('we"ird') == '"we""ird"'


def test_retrieval_docstring_matches_arithmetic():
    from analyst_spark.functions import retrieval

    doc = retrieval.__doc__
    assert "DECIMAL(28,0)" in doc
    assert "decimal(38,0)" not in doc
    assert "LN-PARITY" in doc  # the gate assumption is stated


def test_bulk_row_non_latin1_raises_clear_error():
    cols = [("id", "int"), ("city", "varchar")]
    # Latin-1 text still round-trips.
    payload = tds.bulk_row(cols, [1, "Zürich"])
    assert "Zürich".encode("latin-1") in payload
    try:
        tds.bulk_row(cols, [2, "東京"])
    except ValueError as e:
        msg = str(e)
        assert "city" in msg and "Latin-1" in msg and "東京" in msg
    else:
        raise AssertionError("non-Latin-1 value must raise ValueError")


def test_bulk_row_error_is_not_unicode_error():
    # The deep UnicodeEncodeError must not escape raw.
    cols = [("note", "varchar")]
    try:
        tds.bulk_row(cols, ["☃ snowman"])
    except ValueError:
        pass
    except UnicodeEncodeError as e:  # pragma: no cover
        raise AssertionError(f"raw UnicodeEncodeError escaped: {e}")
