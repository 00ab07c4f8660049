"""Round-12 (session 2) additions: Bloom-pruned contamination,
cross-corpus minhash decontamination, deterministic global shuffle.

Each entry is hash-gated vs DuckDB in tools/verify_local.py; the
tests here pin the CLAIMS the gates can't see:
- the bloom path returns the exact same frame as the broadcast path
  (not merely the same oracle hash at one scale),
- the cross-corpus join equals the filtered self-join,
- the shuffle is a genuine per-shard permutation and is deterministic
  across independent plan builds.
"""

import pytest
from pyspark.sql import functions as F

from analyst_spark.plans import pipeline_plans as pp
from analyst_spark.plans import text_plans as tp
from tests.conftest import SF_DIR


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_contamination_bloom_equals_ngram(spark):
    a = _rows(
        pp.contamination_ngram(spark, SF_DIR),
        "doc_id", "n_ngrams", "n_matched", "overlap_ratio",
    )
    b = _rows(
        pp.contamination_bloom(spark, SF_DIR),
        "doc_id", "n_ngrams", "n_matched", "overlap_ratio",
    )
    assert a == b
    assert len(a) > 0  # the synthetic corpus plants flagged docs


def test_contamination_minhash_equals_filtered_selfjoin(spark):
    cross = _rows(
        tp.contamination_minhash(spark, SF_DIR),
        "train_id", "bench_id", "n_bands",
    )
    pairs = tp.dedup_minhash(spark, SF_DIR)
    m = tp._XCONTA_MOD
    filtered = pairs.filter(
        (F.col("id_a") % m == 0) != (F.col("id_b") % m == 0)
    ).select(
        F.when(F.col("id_a") % m == 0, F.col("id_b"))
        .otherwise(F.col("id_a")).alias("train_id"),
        F.when(F.col("id_a") % m == 0, F.col("id_a"))
        .otherwise(F.col("id_b")).alias("bench_id"),
        "n_bands",
    )
    assert cross == _rows(filtered, "train_id", "bench_id", "n_bands")


def test_streaming_contamination_twin_row_identical(spark):
    from analyst_spark.plans import streaming_plans as st

    batch = _rows(
        tp.contamination_minhash(spark, SF_DIR),
        "train_id", "bench_id", "n_bands",
    )
    stream = _rows(
        st.streaming_contamination_minhash(spark, SF_DIR),
        "train_id", "bench_id", "n_bands",
    )
    assert stream == batch


def test_streaming_contamination_embedding_twin_row_identical(spark):
    from analyst_spark.plans import streaming_plans as st

    batch = _rows(
        tp.contamination_embedding(spark, SF_DIR),
        "train_id", "bench_id", "cosine_sim",
    )
    stream = _rows(
        st.streaming_contamination_embedding(spark, SF_DIR),
        "train_id", "bench_id", "cosine_sim",
    )
    assert stream == batch
    assert len(batch) > 0


def test_contamination_minhash_no_same_side_pairs(spark):
    m = tp._XCONTA_MOD
    out = tp.contamination_minhash(spark, SF_DIR)
    bad = out.filter(
        (F.col("train_id") % m == 0) | (F.col("bench_id") % m != 0)
    ).count()
    assert bad == 0


def test_contamination_embedding_recovers_exactly_the_plants(spark):
    out = _rows(
        tp.contamination_embedding(spark, SF_DIR),
        "train_id", "bench_id", "cosine_sim",
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    planted = sorted(
        (r["vec_id"] + tp._XEMB_OFFSET, r["vec_id"], 1.0)
        for r in emb.filter(
            (F.col("vec_id") % tp._XEMB_MOD == 0)
            & (F.col("vec_id") % tp._TWIN_STEP == 0)
            # mirror the entry's drop_null_vectors prep: a null
            # embedding at a qualifying vec_id would otherwise put a
            # row in `planted` the entry can never emit (r12 advisor).
            & F.col("embedding").isNotNull()
        ).select("vec_id").collect()
    )
    assert out == planted
    assert len(planted) > 0


def test_global_shuffle_is_sharded_permutation(spark):
    out = pp.docs_global_shuffle(spark, SF_DIR).persist()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    try:
        # every document exactly once
        assert out.count() == n_docs
        assert out.select("doc_id").distinct().count() == n_docs
        # pos is contiguous 1..n within each shard
        per_shard = out.groupBy("shard_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.countDistinct("pos").alias("nd"),
        )
        for r in per_shard.collect():
            assert (r["lo"], r["hi"], r["nd"]) == (1, r["n"], r["n"])
        # all shards in range and used (md5 spreads 32 bits; an
        # empty auto-sized shard over thousands of docs would be a
        # hashing bug) — r13: n_shards derives from the corpus count
        from analyst_spark.functions.shuffle import shard_count_for

        n_shards = shard_count_for(n_docs, pp._ROWS_PER_SHARD)
        assert n_shards >= 2, "gate corpus must exercise multi-shard"
        shards = {r["shard_id"] for r in per_shard.collect()}
        assert shards == set(range(n_shards))
    finally:
        out.unpersist()


def test_global_shuffle_deterministic_and_decorrelated(spark):
    a = _rows(pp.docs_global_shuffle(spark, SF_DIR),
              "doc_id", "shard_id", "pos")
    b = _rows(pp.docs_global_shuffle(spark, SF_DIR),
              "doc_id", "shard_id", "pos")
    assert a == b
    # the permutation must not be the identity-ish doc_id order:
    # within some shard, consecutive positions are non-consecutive ids
    by_shard = {}
    for doc_id, shard, pos in a:
        by_shard.setdefault(shard, []).append((pos, doc_id))
    monotone_shards = sum(
        1
        for rows in by_shard.values()
        if [d for _, d in sorted(rows)] == sorted(d for _, d in rows)
    )
    assert monotone_shards < len(by_shard)


def test_funnel_v3_extends_v2_and_decontaminate_bites(spark):
    v2 = {
        r["stage_rank"]: (r["stage"], r["n_docs"], r["n_tokens"])
        for r in pp.docs_curation_funnel_v2(spark, SF_DIR).collect()
    }
    v3 = {
        r["stage_rank"]: (r["stage"], r["n_docs"], r["n_tokens"])
        for r in pp.docs_curation_funnel_v3(spark, SF_DIR).collect()
    }
    # stages 1-5 are bit-identical to v2 (same shared scan, same
    # thresholds); v3 only appends the decontamination stage
    assert {k: v2[k] for k in range(1, 6)} == {k: v3[k] for k in range(1, 6)}
    assert v3[6][0] == "decontaminate"
    # monotone and genuinely biting on the synthetic corpus (it
    # plants near-copies of benchmark members that survive to lm)
    assert v3[6][1] < v3[5][1]
    assert v3[6][2] < v3[5][2]


def test_shuffled_pack_conserves_tokens_and_reorders(spark):
    out = pp.docs_shuffled_pack(spark, SF_DIR).persist()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    try:
        total = docs.select(
            F.sum(F.size(F.split("text", " ")).cast("long"))
        ).first()[0]
        agg = out.agg(
            F.sum("n_tokens").alias("tok"),
            F.sum("n_docs").alias("docs"),
            F.max("seq_id").alias("hi"),
            F.countDistinct("seq_id").alias("nd"),
        ).first()
        # every token and every document packed exactly once
        assert agg["tok"] == total
        assert agg["docs"] == docs.count()
        # sequence ids contiguous from 0
        assert agg["nd"] == agg["hi"] + 1
        assert out.filter(F.col("seq_id") == 0).count() == 1
        # the shuffled packing genuinely reorders: sequence 0 does not
        # start at the minimum doc_id (p = 1/n_docs for a false alarm)
        first = out.filter(F.col("seq_id") == 0).first()["first_doc"]
        assert first != docs.agg(F.min("doc_id")).first()[0]
    finally:
        out.unpersist()


def test_global_shuffle_seed_changes_order(spark, monkeypatch):
    base = _rows(pp.docs_global_shuffle(spark, SF_DIR),
                 "doc_id", "shard_id", "pos")
    monkeypatch.setattr(pp, "_SHUFFLE_SEED", "epoch1")
    other = _rows(pp.docs_global_shuffle(spark, SF_DIR),
                  "doc_id", "shard_id", "pos")
    assert base != other
    assert {r[0] for r in base} == {r[0] for r in other}
