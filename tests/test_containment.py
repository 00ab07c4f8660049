"""dedup_containment (asymmetric prefix-filter join): the hash gate
proves equality with the brute-force oracle (= completeness); these
pin the DEFINITION on planted containments and the asymmetry that
motivates the operator (high containment where Jaccard is low)."""

import itertools
import os

import pytest

from analyst_spark.functions.dedup import containment_pairs, release_cached
from analyst_spark.plans.catalog import QUERIES


def _shingles(text, n=3):
    toks = [w for w in text.split(" ") if w]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


SHORT = "alpha beta gamma delta epsilon"
LONG = (
    "intro words here " + SHORT + " and a very long tail of unrelated "
    "filler content that keeps going with many extra tokens"
)

CORPUS = [
    (0, SHORT),                 # fully contained in 1 (quote expansion)
    (1, LONG),
    (2, "one two three four five six"),
    (3, "one two three four five seven"),  # high overlap with 2, symmetric
    (4, "totally different text in this document right here"),
]


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in CORPUS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _model(num=4, den=5):
    sets = {i: _shingles(t) for i, t in CORPUS}
    want = {}
    for a, b in itertools.permutations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa:
            continue
        i = len(sa & sb)
        if den * i >= num * len(sa):
            want[(a, b)] = round(i / len(sa), 6)
    return want


def test_matches_python_model(spark, planted):
    out = containment_pairs(planted, threshold_num=4, threshold_den=5)
    rows = {
        (r.id_contained, r.id_container): r.containment for r in out.collect()
    }
    release_cached(out)
    want = _model()
    assert rows == want and want


def test_asymmetry_is_the_point(spark, planted):
    """Doc 0 is fully inside doc 1 (containment 1.0) while their
    Jaccard is far below the symmetric threshold — the pair the
    symmetric join structurally cannot report."""
    out = containment_pairs(planted, threshold_num=4, threshold_den=5)
    rows = {
        (r.id_contained, r.id_container): r.containment for r in out.collect()
    }
    release_cached(out)
    assert rows[(0, 1)] == 1.0
    assert (1, 0) not in rows  # the long doc is NOT inside the short one
    sa, sb = _shingles(SHORT), _shingles(LONG)
    jaccard = len(sa & sb) / len(sa | sb)
    assert jaccard < 0.6  # below the symmetric entry's threshold
