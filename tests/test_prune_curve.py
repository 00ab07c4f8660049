"""docs_quality_prune_curve: the hash gate proves Spark == DuckDB;
these pin the DEFINITION against a pure-Python frozen-scorer model
and the curve's structural properties."""

import hashlib
import os

import pytest

from analyst_spark.functions.classifier_frozen import (
    BIAS_NANO,
    N_BUCKETS,
    WEIGHTS_NANO,
)
from analyst_spark.plans.catalog import QUERIES
from analyst_spark.plans.pipeline_plans import _PRUNE_GRID


def _margin_ints(text):
    toks = [w for w in text.strip().lower().split()] or [""]
    # NB: split of trimmed text on whitespace; empty text -> [""]
    numer, total = 0, 0
    for w in toks:
        b = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % N_BUCKETS
        numer += WEIGHTS_NANO[b]
        total += 1
    return numer, total


def _model(texts):
    scored = []
    for t in texts:
        if t is None:
            scored.append((None, None, None))
            continue
        numer, total = _margin_ints(t)
        scored.append((numer, total, len(t.strip().split()) or 1))
    all_docs = len(scored)
    all_tokens = sum(tk for _, _, tk in scored if tk is not None)
    out = []
    for thr in _PRUNE_GRID:
        nd = nt = 0
        for numer, total, tk in scored:
            if numer is None:
                continue
            if numer + BIAS_NANO * total >= thr * total * 1_000_000:
                nd += 1
                nt += tk
        out.append(
            (
                thr,
                nd,
                nt,
                nd * 1_000_000 // all_docs,
                nt * 1_000_000 // all_tokens,
            )
        )
    return out


@pytest.fixture(scope="module")
def planted_sf(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("prune"))
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "lorem ipsum dolor sit amet consectetur adipiscing elit",
        "aaa bbb ccc ddd eee fff",
        "one two three four five six seven eight nine ten",
        None,  # NULL text: counted in the denominator, never kept
        "zzz yyy xxx www",
    ]
    spark.createDataFrame(
        [
            (i, t, "en", "web", len(t) if t else 0)
            for i, t in enumerate(texts)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(td, "documents.parquet"))
    return td, texts


def test_matches_python_model(spark, planted_sf):
    td, texts = planted_sf
    got = [
        (r.thr_milli, r.n_docs_kept, r.n_tokens_kept, r.docs_ppm, r.tokens_ppm)
        for r in QUERIES["docs_quality_prune_curve"](spark, td)
        .orderBy("thr_milli")
        .collect()
    ]
    assert got == _model(texts)


def test_curve_is_monotone_and_anchored(spark):
    rows = (
        QUERIES["docs_quality_prune_curve"](spark, "/root/testdata/sf0.001")
        .orderBy("thr_milli")
        .collect()
    )
    assert [r.thr_milli for r in rows] == _PRUNE_GRID
    kept = [r.n_docs_kept for r in rows]
    assert kept == sorted(kept, reverse=True)  # monotone non-increasing
    assert rows[0].docs_ppm == 1_000_000  # -0.2 cut keeps everything
    assert rows[-1].n_docs_kept == 0  # 1.0 cut keeps nothing
    # the fine band actually discriminates (not a step function)
    assert len(set(kept)) >= 4
