"""docs_collocations_pmi: the hash gate proves equality with the
DuckDB twin; these pin the DEFINITION against a pure-Python model and
the ranking property (a planted collocation outranks independent
pairs)."""

import itertools
import os

import pytest

from analyst_spark.plans.catalog import QUERIES
from analyst_spark.plans.pipeline_plans import _PMI_MIN_COUNT, _PMI_TOP_K


def _lift_model(texts, min_count=_PMI_MIN_COUNT, top_k=_PMI_TOP_K):
    """Pure-Python integer-lift reference."""
    c1, c2 = {}, {}
    for t in texts:
        toks = [w for w in t.strip().lower().split() if w]
        for w in toks:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    n1 = sum(c1.values())
    n2 = sum(c2.values())
    rows = [
        (a, b, c, (c * n1 * n1 * 1_000_000) // (n2 * c1[a] * c1[b]))
        for (a, b), c in c2.items()
        if c >= min_count
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:top_k]


@pytest.fixture(scope="module")
def planted_sf(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("pmi"))
    # "new york" always adjacent (planted collocation); filler tokens
    # deterministic and shuffled-by-construction so filler bigrams are
    # frequent but independent
    filler = ["alpha", "beta", "gamma", "delta"]
    texts = []
    for d in range(25):
        ws = []
        for i in range(12):
            ws.append(filler[(d * 7 + i * 3) % 4])
            if i % 4 == 1:
                ws += ["new", "york"]
        texts.append(" ".join(ws))
    texts.append("")  # empty doc: no tokens either side
    # a pair below the support floor (count 2 < _PMI_MIN_COUNT)
    texts.append("raretok1 raretok2 alpha raretok1 raretok2")
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(td, "documents.parquet"))
    return td, texts


def test_matches_python_model(spark, planted_sf):
    td, texts = planted_sf
    got = [
        (r.w1, r.w2, r.pair_count, r.lift_micro)
        for r in QUERIES["docs_collocations_pmi"](spark, td).collect()
    ]
    assert got == _lift_model(texts)


def test_planted_collocation_ranks_first(spark, planted_sf):
    td, _ = planted_sf
    top = QUERIES["docs_collocations_pmi"](spark, td).first()
    assert (top.w1, top.w2) == ("new", "york")
    # lift > 1e6 means positive PMI (association beyond independence)
    assert top.lift_micro > 1_000_000


def test_support_floor_bites(spark, planted_sf):
    td, texts = planted_sf
    rare = {
        pair
        for pair, c in _count_pairs(texts).items()
        if c < _PMI_MIN_COUNT
    }
    got = {
        (r.w1, r.w2)
        for r in QUERIES["docs_collocations_pmi"](spark, td).collect()
    }
    assert rare and not (rare & got)


def _count_pairs(texts):
    c2 = {}
    for t in texts:
        toks = [w for w in t.strip().lower().split() if w]
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    return c2
