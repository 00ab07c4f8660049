"""Hybrid retrieval (docs_rrf_hybrid / functions.retrieval.rrf_fuse):
the integer-nano RRF device must equal a pure-Python replica, fusion
must handle docs present in only one list, and the entry must survive
an empty corpus (both tables empty)."""

import os

import pytest
from pyspark.sql import functions as F

from analyst_spark.functions.dedup import release_cached
from analyst_spark.functions.retrieval import rrf_fuse
from analyst_spark.plans.catalog import QUERIES


def _ranked(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank int")


def test_rrf_matches_python_replica(spark):
    bm = [(10, 1), (11, 2), (12, 3), (13, 4)]
    cos = [(12, 1), (10, 2), (14, 3)]
    out = rrf_fuse(
        [("bm25", _ranked(spark, bm)), ("cos", _ranked(spark, cos))],
        k=10,
        rrf_k=60,
    ).collect()

    ranks = {"bm25": dict(bm), "cos": dict(cos)}
    ids = {d for d, _ in bm} | {d for d, _ in cos}
    model = {
        d: sum(
            1000000000 // (60 + ranks[s][d]) for s in ranks if d in ranks[s]
        )
        for d in ids
    }
    expect = sorted(model.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r.doc_id, r.rrf_nano) for r in out] == expect
    for r in out:
        assert r.bm25_rank == ranks["bm25"].get(r.doc_id)
        assert r.cos_rank == ranks["cos"].get(r.doc_id)
        assert r.rrf_score == r.rrf_nano / 1e9


def test_rrf_both_lists_beat_one(spark):
    # A doc ranked moderately in BOTH lists outscores a doc that tops
    # one list only: 2/(60+5) > 1/61.
    bm = [(1, 1), (2, 5)]
    cos = [(3, 1), (2, 5)]
    rows = rrf_fuse(
        [("bm25", _ranked(spark, bm)), ("cos", _ranked(spark, cos))], k=3
    ).collect()
    assert rows[0].doc_id == 2


def test_rrf_requires_two_rankings(spark):
    with pytest.raises(ValueError):
        rrf_fuse([("only", _ranked(spark, [(1, 1)]))])


def test_rrf_k_cut_and_tie_break(spark):
    # Equal fused scores break by doc_id ascending; k cuts the list.
    bm = [(5, 1), (4, 2)]
    cos = [(4, 1), (5, 2)]  # both docs score 1/61 + 1/62
    rows = rrf_fuse(
        [("bm25", _ranked(spark, bm)), ("cos", _ranked(spark, cos))], k=1
    ).collect()
    assert len(rows) == 1 and rows[0].doc_id == 4


def test_entry_on_real_corpus(spark):
    df = QUERIES["docs_rrf_hybrid"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    release_cached(df)
    assert 0 < len(rows) <= 20
    assert [r.rrf_nano for r in rows] == sorted(
        (r.rrf_nano for r in rows), reverse=True
    )
    # every fused doc must come from at least one list
    assert all(
        r.bm25_rank is not None or r.cos_rank is not None for r in rows
    )


def test_entry_survives_empty_corpus(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("rrf_empty"))
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(td, "documents.parquet"))
    spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label string"
    ).write.parquet(os.path.join(td, "embeddings.parquet"))
    df = QUERIES["docs_rrf_hybrid"](spark, td)
    rows = df.collect()
    release_cached(df)
    assert rows == []
