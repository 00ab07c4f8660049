"""NULL-robustness: the reference's data model is nullable everywhere
(SURVEY §1.2), but the driver's synthetic tables carry no NULLs — so
nothing exercised NULL text / NULL embedding / NULL event fields until
the r7 null-corpus sweep, which found three crashes
(docs_stratified_sample: None key in sampleBy fractions; five
embedding operators: None vectors reaching numpy batches;
kmeans_train: fewer usable vectors than k). Every documents/events/
embeddings entry must now produce a schema-stable result on a corpus
where every nullable field is NULL somewhere."""

import datetime
import os

import pytest

from analyst_spark.functions.dedup import release_cached
from analyst_spark.plans.catalog import QUERIES

DOC_ENTRIES = [
    "text_stats", "text_quality", "text_langid", "doc_fingerprints",
    "contamination_ngram", "text_pii_scan", "docs_pii_scrub",
    "text_repetition", "text_top_tokens", "text_heavy_hitters_cms", "docs_pack_sequences",
    "doc_winnow_fingerprints", "docs_lm_score", "docs_lm_backoff_score", "docs_perplexity_buckets",
    "docs_gopher_filter", "docs_dsir_weights", "docs_dup_span",
    "docs_dedup_spans", "docs_curation_funnel", "docs_curation_funnel_v2",
    "docs_bm25_topk", "docs_bm25_multi", "docs_rrf_hybrid_multi", "docs_rrf_hybrid", "documents_profile",
    "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_lsh_verified",
    "dedup_ngram_jaccard", "dedup_jaccard_prefix", "dedup_containment", "dedup_pipeline_e2e", "dedup_incremental_neardup", "streaming_incremental_neardup", "streaming_incremental_perceptual", "dedup_incremental_multiday", "dedup_incremental_clusters", "dedup_cluster_quality_rep", "multimodal_incremental_multiday", "multimodal_perceptual_dedup_wide", "dedup_neardup_routed", "docs_quality_classifier",
    "docs_split_leakage", "docs_collocations_pmi", "docs_quality_prune_curve",
    "docs_chunk_windows", "docs_train_test_split", "docs_stratified_sample", "docs_consistent_sample",
    "corpus_prep_pipeline",
    "contamination_bloom", "contamination_minhash", "docs_global_shuffle", "docs_epoch_shuffle",
    "streaming_contamination_minhash", "docs_shuffled_pack",
    "docs_curation_funnel_v3",
    "contamination_delta", "contamination_delta_stateful", "docs_curriculum_order",
    "docs_curriculum_pack",
    "streaming_contamination_delta",
]

EMB_ENTRIES = [
    "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_ivf_adaptive", "ann_ivf_incremental", "ann_ivf_trained",
    "ann_quantized_rerank",
    "ann_pca_ivf", "dedup_embedding", "dedup_incremental_embedding", "streaming_incremental_embedding", "dedup_incremental_embedding_multiday", "dedup_semantic",
    "dedup_semantic_trained", "embeddings_pca", "embeddings_quantize_int8",
    "knn_label_propagation", "contamination_embedding",
    "streaming_contamination_embedding",
]

EVENT_ENTRIES = [
    "events_hourly_rollup", "events_user_sessions", "events_funnel",
    "events_anomaly_zscore", "events_anomaly_mad", "events_moving_avg", "events_lag_delta",
    "events_cohort_retention", "events_rollup", "events_pivot",
    "events_distinct_users", "events_salted_rollup", "events_json_props",
    "events_asof_view_click", "events_range_join", "events_session_window",
    "events_sessions_chunked",
    "events_gapfill_interpolate", "events_gapfill_routed",
    "events_value_histogram",
    "events_distinct_users_hll",
    "streaming_distinct_users_hll",
    "streaming_value_histogram",
]


@pytest.fixture(scope="module")
def null_sf(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("null_sf"))
    docs = spark.createDataFrame(
        [
            (0, "normal words here for a document body", "en", "web", 37),
            (1, None, "en", "web", None),           # NULL text
            (2, "", "en", None, 0),                 # empty text, NULL source
            (3, "ok text present", None, "web", 15),  # NULL lang
            (4, None, None, None, None),            # all NULL
            (5, "the quick brown fox jumps", "en", "web", 25),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(os.path.join(td, "documents.parquet"))
    ts = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (0, ts, 1, "view", 1.0, '{"k": 1}'),
            (1, ts, 1, None, 2.0, None),            # NULL type/props
            (2, ts, 2, "click", None, '{"k": 2}'),  # NULL value
            (3, None, 2, "purchase", 3.0, "{}"),    # NULL ts
            (4, ts, None, "view", None, None),      # NULL user
            (5, ts + datetime.timedelta(hours=1), 1, "view", 2.5, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.write.parquet(os.path.join(td, "events.parquet"))
    emb = spark.createDataFrame(
        [
            (0, [float(i) for i in range(8)], "a"),
            (1, None, "b"),                         # NULL vector
            (2, [float(i + 1) for i in range(8)], None),  # NULL label
            (3, None, None),
            (4, [float(2 * i) for i in range(8)], "a"),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    emb.write.parquet(os.path.join(td, "embeddings.parquet"))
    for f in os.listdir("/root/testdata/sf0.001"):
        dst = os.path.join(td, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join("/root/testdata/sf0.001", f), dst)
    return td


@pytest.mark.parametrize(
    "name", DOC_ENTRIES + EMB_ENTRIES + EVENT_ENTRIES
)
def test_entry_survives_nulls(spark, null_sf, name):
    df = QUERIES[name](spark, null_sf)
    df.collect()
    release_cached(df)


@pytest.fixture(scope="module")
def extreme_sf(spark, tmp_path_factory):
    """One 1e18-valued poison row — beyond the integer-cents domain.
    Under ANSI arithmetic this crashed five operators with
    CAST_OVERFLOW (r7 extreme-value probe); cents_of now maps
    out-of-domain values to NULL measurements."""
    td = str(tmp_path_factory.mktemp("extreme_sf"))
    ts = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (0, ts, 1, "view", 1.5, "{}"),
            (1, ts, 1, "view", 1e18, "{}"),
            (2, ts, 2, "click", -1e18, "{}"),
            (3, ts, 2, "click", 0.01, "{}"),
            (4, ts, 2, "click", 0.03, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.write.parquet(os.path.join(td, "events.parquet"))
    for f in os.listdir("/root/testdata/sf0.001"):
        dst = os.path.join(td, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join("/root/testdata/sf0.001", f), dst)
    return td


@pytest.mark.parametrize("name", [
    "events_hourly_rollup", "events_moving_avg", "events_anomaly_zscore",
    "events_gapfill_interpolate", "events_value_histogram",
    "streaming_hourly_rollup", "streaming_anomaly_gate", "streaming_anomaly_mad",
])
def test_cents_entries_survive_extreme_values(spark, extreme_sf, name):
    df = QUERIES[name](spark, extreme_sf)
    rows = df.collect()
    release_cached(df)
    if name != "events_anomaly_zscore":  # legitimately empty: no |z|>3
        assert rows  # aggregates exist; poison rows excluded, not fatal


def test_extreme_values_excluded_as_null_measurements(spark, extreme_sf):
    """The poison rows count as events but not as measurements."""
    rows = {r.event_type: r for r in QUERIES["events_hourly_rollup"](
        spark, extreme_sf).collect()}
    view = rows["view"]
    assert view.n_events == 2          # the 1e18 row is still an event
    assert view.avg_value == 1.5       # mean over VALID measurements
    assert view.sum_value == 1.5
    click = rows["click"]
    assert click.n_events == 3
    assert click.avg_value == 0.02     # (1 + 3) cents / 2 valid
