"""Degenerate-input robustness: every documents-family catalog entry
must run (produce a possibly-empty, schema-stable DataFrame) on an
EMPTY corpus — the day-one state of a real ingestion pipeline, and a
classic crash source (empty collects, div-by-zero stats, max() of
nothing). Iterative trainers must return empty models, not raise."""

import os

import pytest

from analyst_spark.functions.dedup import release_cached
from analyst_spark.plans.catalog import QUERIES

DOC_ENTRIES = [
    "text_stats", "text_quality", "text_langid", "doc_fingerprints",
    "contamination_ngram", "text_pii_scan", "docs_pii_scrub",
    "text_repetition", "text_top_tokens", "text_heavy_hitters_cms", "docs_pack_sequences",
    "doc_winnow_fingerprints", "docs_lm_score", "docs_lm_backoff_score", "docs_perplexity_buckets",
    "docs_gopher_filter",
    "docs_dsir_weights", "docs_dup_span", "docs_dedup_spans",
    "docs_curation_funnel", "docs_curation_funnel_v2",
    "docs_bm25_topk", "docs_bm25_multi",
    "streaming_classifier_gate",
    "dedup_exact", "dedup_minhash", "dedup_simhash",
    "dedup_lsh_verified", "docs_quality_classifier",
    "multimodal_binary_dedup", "multimodal_perceptual_dedup", "multimodal_perceptual_dedup_wide", "multimodal_audio_perceptual_dedup",
    "multimodal_video_perceptual_dedup", "multimodal_incremental_perceptual", "multimodal_incremental_multiday",
    "dedup_ngram_jaccard", "dedup_jaccard_prefix", "dedup_containment", "dedup_pipeline_e2e", "dedup_incremental_neardup", "streaming_incremental_neardup", "streaming_incremental_perceptual", "dedup_incremental_multiday", "dedup_incremental_clusters", "dedup_cluster_quality_rep", "dedup_neardup_routed", "docs_chunk_windows",
    "docs_split_leakage", "docs_collocations_pmi", "docs_quality_prune_curve",
    "docs_train_test_split", "docs_consistent_sample",
    "bpe_train_merges", "bpe_train_batched",
    "contamination_bloom", "contamination_minhash", "docs_global_shuffle", "docs_epoch_shuffle",
    "streaming_contamination_minhash", "docs_shuffled_pack",
    "docs_curation_funnel_v3",
    "contamination_delta", "contamination_delta_stateful", "docs_curriculum_order",
    "docs_curriculum_pack",
    "streaming_contamination_delta",
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("empty_sf"))
    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(os.path.join(td, "documents.parquet"))
    return td


@pytest.mark.parametrize("name", DOC_ENTRIES)
def test_entry_survives_empty_corpus(spark, empty_sf, name):
    df = QUERIES[name](spark, empty_sf)
    rows = df.collect()
    release_cached(df)
    if name == "docs_curation_funnel":
        # the funnel still reports its four (empty) stages
        assert sorted(r.stage for r in rows) == ["dedup", "gopher", "lm", "raw"]
        assert all(r.n_docs == 0 for r in rows)
    elif name == "docs_curation_funnel_v2":
        assert sorted(r.stage for r in rows) == [
            "classifier", "dedup", "gopher", "lm", "raw"]
        assert all(r.n_docs == 0 for r in rows)
    elif name == "docs_curation_funnel_v3":
        assert sorted(r.stage for r in rows) == [
            "classifier", "decontaminate", "dedup", "gopher", "lm", "raw"]
        assert all(r.n_docs == 0 for r in rows)
    elif name == "dedup_pipeline_e2e":
        assert sorted(r.stage for r in rows) == [
            "exact", "final", "raw", "verified_pairs"]
        assert all(r.n == 0 for r in rows)
    elif name == "docs_quality_prune_curve":
        # grid-anchored report: all 16 cuts present, zero counts,
        # NULL ppm shares (0/0)
        from analyst_spark.plans.pipeline_plans import _PRUNE_GRID

        assert sorted(r.thr_milli for r in rows) == sorted(_PRUNE_GRID)
        assert all(
            r.n_docs_kept == 0 and r.n_tokens_kept == 0
            and r.docs_ppm is None and r.tokens_ppm is None
            for r in rows
        )
    else:
        assert rows == []


EVENT_ENTRIES = [
    "streaming_anomaly_gate", "streaming_anomaly_mad",
    "events_hourly_rollup", "events_user_sessions", "events_moving_avg",
    "events_lag_delta", "events_cohort_retention", "events_funnel",
    "events_anomaly_zscore", "events_anomaly_mad", "events_rollup", "events_pivot",
    "events_distinct_users", "events_salted_rollup",
    "events_sessions_chunked",
    "events_gapfill_interpolate", "events_gapfill_routed",
    "events_value_histogram",
    "events_distinct_users_hll",
    "streaming_distinct_users_hll",
    "streaming_value_histogram",
]

EMB_ENTRIES = ["dedup_semantic", "dedup_semantic_trained", "ann_cosine_topk", "dedup_incremental_embedding", "streaming_incremental_embedding", "dedup_incremental_embedding_multiday",
               "ann_lsh_topk", "ann_ivf_adaptive", "ann_ivf_incremental", "ann_quantized_rerank", "dedup_embedding", "knn_label_propagation",
               "embeddings_pca", "ann_pca_ivf", "embeddings_quantize_int8",
               "contamination_embedding",
               "streaming_contamination_embedding"]


@pytest.fixture(scope="module")
def empty_events_sf(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("empty_ev"))
    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.write.parquet(os.path.join(td, "events.parquet"))
    return td


@pytest.fixture(scope="module")
def empty_emb_sf(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("empty_emb"))
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label string"
    )
    emb.write.parquet(os.path.join(td, "embeddings.parquet"))
    return td


@pytest.mark.parametrize("name", EVENT_ENTRIES)
def test_event_entry_survives_empty(spark, empty_events_sf, name):
    df = QUERIES[name](spark, empty_events_sf)
    rows = df.collect()
    release_cached(df)
    assert rows == [] or all(
        getattr(r, c, 0) in (0, None) for r in rows for c in ("n", "n_events")
    )


@pytest.mark.parametrize("name", EMB_ENTRIES)
def test_embedding_entry_survives_empty(spark, empty_emb_sf, name):
    df = QUERIES[name](spark, empty_emb_sf)
    rows = df.collect()
    release_cached(df)
    assert rows == []
