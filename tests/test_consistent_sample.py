"""docs_consistent_sample: gate proves Spark == DuckDB; these pin the
consistency PROPERTY (the sample is stable under corpus growth) and
the WindowGroupLimit plan shape the 100 TB story depends on."""

import hashlib
import os

import pytest

from analyst_spark.plans.analytics_plans import _BOTTOMK_K
from analyst_spark.plans.catalog import QUERIES


def _write_docs(spark, td, ids):
    spark.createDataFrame(
        [(i, f"text {i}", "en" if i % 2 else "fr", "web", 10) for i in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))


def _model(ids, k=_BOTTOMK_K):
    by_lang = {}
    for i in ids:
        lang = "en" if i % 2 else "fr"
        h = hashlib.md5(str(i).encode()).hexdigest()
        by_lang.setdefault(lang, []).append((h, i))
    out = set()
    for lang, rows in by_lang.items():
        for rnk, (h, i) in enumerate(sorted(rows)[:k], 1):
            out.add((lang, rnk, i))
    return out


def test_matches_model_and_stable_under_growth(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("bottomk"))
    small = list(range(200))
    _write_docs(spark, td, small)
    got_small = {
        (r.lang, r.rnk, r.doc_id)
        for r in QUERIES["docs_consistent_sample"](spark, td).collect()
    }
    assert got_small == _model(small)

    # grow the corpus 5x: the new sample must equal the bottom-k of
    # the union — surviving old members keep RELATIVE order, and the
    # only changes are hash-beating replacements (no churn)
    big = list(range(1000))
    _write_docs(spark, td, big)
    got_big = {
        (r.lang, r.rnk, r.doc_id)
        for r in QUERIES["docs_consistent_sample"](spark, td).collect()
    }
    assert got_big == _model(big)
    survivors_small = {(l, d) for l, _, d in got_small}
    survivors_big = {(l, d) for l, _, d in got_big}
    kept = survivors_small & survivors_big
    assert kept  # growth replaces some entries, never all
    # relative order of survivors is preserved
    rank_small = {(l, d): r for l, r, d in got_small}
    rank_big = {(l, d): r for l, r, d in got_big}
    for lang in ("en", "fr"):
        ks = sorted(
            (rank_small[k], rank_big[k]) for k in kept if k[0] == lang
        )
        assert all(
            b1 < b2 for (_, b1), (_, b2) in zip(ks, ks[1:])
        )


def test_window_group_limit_plan_shape(spark):
    """The rank filter must push into WindowGroupLimit so each map
    task keeps <= k rows per lang before the exchange."""
    import contextlib
    import io

    df = QUERIES["docs_consistent_sample"](spark, "/root/testdata/sf0.01")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "WindowGroupLimit" in plan
