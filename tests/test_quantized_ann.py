"""ann_quantized_rerank quality + edge pins (r14).

The entry is hash-gated vs DuckDB (the integer candidate stage has no
float ties, so the WHOLE pipeline is in the gate hash — unlike the
trained IVF variants). What the hash cannot pin is the QUALITY of the
int8 proxy: this module measures recall@10 of the quantized candidate
scan + rerank against the exact-cosine baseline on the driver corpus,
and exercises the degenerate shapes the sweeps cover for the other
ann entries (empty corpus, null vectors, constant dimension, corpus
smaller than the candidate depth).

Measured at HEAD (tools: inline sweep, 2026-08-16): per-query recall
[0.9, 1.0, 1.0, 1.0, 1.0] at sf0.001 and [1.0 x 5] at sf0.01 with
candidates = 3x k. Floor pinned with slack at 0.8 min / 0.9 mean.
"""

import pytest
from pyspark.sql import functions as F

from analyst_spark.functions.similarity import (
    cosine_topk,
    quantized_rerank_topk,
)

SF_001 = "/root/testdata/sf0.001"


def _recalls(exact_rows, quant_rows):
    exact, quant = {}, {}
    for r in exact_rows:
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    for r in quant_rows:
        quant.setdefault(r.query_id, set()).add(r.vec_id)
    return [
        len(exact[q] & quant.get(q, set())) / len(exact[q]) for q in exact
    ]


def test_recall_vs_exact_baseline(spark):
    from analyst_spark.plans.text_plans import (
        ann_cosine_topk,
        ann_quantized_rerank,
    )

    rec = _recalls(
        ann_cosine_topk(spark, SF_001).collect(),
        ann_quantized_rerank(spark, SF_001).collect(),
    )
    assert len(rec) == 5
    assert min(rec) >= 0.8, rec
    assert sum(rec) / len(rec) >= 0.9, rec


def test_q_score_is_bounded_integer(spark):
    from analyst_spark.plans.text_plans import ann_quantized_rerank

    rows = ann_quantized_rerank(spark, SF_001).collect()
    bound = 64 * 255 * 255  # dim * levels^2
    for r in rows:
        assert isinstance(r.q_score, int)
        assert -bound <= r.q_score <= bound


def test_rank_contract_matches_ann_family(spark):
    """Same output contract as the other ann entries: k rows per
    query, rank 1..k, cosine descending with id tiebreak."""
    from analyst_spark.plans.text_plans import ann_quantized_rerank

    rows = ann_quantized_rerank(spark, SF_001).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r.cosine_sim, r.vec_id) for r in rs]
        assert keys == sorted(keys)
        assert all(r.vec_id != q for r in rs)


def test_empty_corpus_schema_stable(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = quantized_rerank_topk(emb, emb, k=5, candidates=10)
    assert out.columns == [
        "vec_id", "query_id", "rank", "cosine_sim", "q_score"
    ] or out.columns == [
        "query_id", "vec_id", "rank", "cosine_sim", "q_score"
    ]
    assert out.count() == 0


def test_null_vectors_dropped_and_constant_dim(spark):
    # dim 1 is constant across the corpus (scale 0 -> code 0 for all);
    # one row has a NULL vector and must not crash or appear
    rows = [
        (0, [1.0, 5.0, 0.2]),
        (1, [0.9, 5.0, 0.1]),
        (2, [-1.0, 5.0, 0.9]),
        (3, None),
        (4, [0.5, 5.0, 0.55]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0)
    out = quantized_rerank_topk(emb, q, k=3, candidates=3).collect()
    assert len(out) == 3
    assert all(r.query_id == 0 and r.vec_id != 3 for r in out)
    # nearest by cosine among (1,2,4) given dim-2 dominance: all share
    # the 5.0 component; the exact rerank must order 1 first
    assert out[0].vec_id == 1 or out[0].rank == 1


def test_corpus_smaller_than_candidate_depth(spark):
    rows = [(i, [float(i), 1.0]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0)
    out = quantized_rerank_topk(emb, q, k=10, candidates=50).collect()
    # 3 non-self rows exist; all must surface, ranks 1..3
    assert sorted(r.rank for r in out) == [1, 2, 3]


def test_query_cap_fails_fast(spark):
    rows = [(i, [float(i), 1.0]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="quantized_rerank_topk"):
        quantized_rerank_topk(emb, emb, k=2, max_queries=5)
