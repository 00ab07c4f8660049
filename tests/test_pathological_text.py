"""Pathological-text robustness: real corpora carry documents the
synthetic tables never produce — 100k+-token documents, single
100k-char tokens (base64 blobs, minified JS), emoji/combining-char
soup, RTL text. The r7 sweep over such a corpus found four
quadratic-cost bugs that were invisible at every gated SF:

* ``_ngrams``/``shingle_tokens`` called with an inline ``split``:
  Catalyst re-evaluates a captured outer expression per transform
  element — O(tokens²) (223 s vs 0.6 s on ONE 60k-token doc);
* ``docs_chunk_windows`` exploding (start, full-token-array) rows —
  one copy of the whole array per chunk;
* unbounded ``[a-z0-9]+@`` PII regex — O(run²) backtracking on long
  alphanumeric runs (120 s per scan);
* BPE fold/rescan loops on a 100k-char word — O(len²) accumulator
  copies (executor hung for minutes).

This test pins the fixes: every entry must COMPLETE on the
pathological corpus within a generous wall-clock bound (pre-fix
costs were minutes-to-hours; post-fix all run in seconds — the bound
only has to separate linear from quadratic).
"""

import os
import time

import pytest

from analyst_spark.functions.dedup import release_cached
from analyst_spark.plans.catalog import QUERIES

ENTRIES = [
    "text_stats", "text_quality", "text_repetition", "text_top_tokens", "text_heavy_hitters_cms",
    "doc_fingerprints", "doc_winnow_fingerprints", "contamination_ngram",
    "contamination_bloom", "contamination_minhash", "docs_shuffled_pack",
    "docs_curation_funnel_v3",
    "contamination_delta", "contamination_delta_stateful", "docs_curriculum_order",
    "docs_curriculum_pack",
    "streaming_contamination_delta",
    "docs_gopher_filter", "docs_lm_score", "docs_dsir_weights", "docs_perplexity_buckets",
    "docs_dup_span", "docs_chunk_windows", "docs_pack_sequences",
    "docs_bm25_topk", "docs_bm25_multi", "docs_rrf_hybrid",
    "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_lsh_verified",
    "dedup_jaccard_prefix", "dedup_containment", "dedup_incremental_neardup", "dedup_incremental_multiday", "dedup_incremental_clusters", "dedup_cluster_quality_rep", "dedup_neardup_routed", "docs_split_leakage", "docs_collocations_pmi", "docs_quality_prune_curve",
    "text_pii_scan", "docs_pii_scrub", "docs_bpe_tokenize_pack",
]

WALL_BOUND_SECS = 120  # post-fix: all < 20s; pre-fix: minutes to hours


@pytest.fixture(scope="module")
def path_sf(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("path_sf"))
    big_doc = " ".join(f"tok{i % 997}" for i in range(120_000))
    emoji = "🎉🚀 " * 300 + "héllo ﬁne combining " * 100
    rtl = "مرحبا بالعالم שלום עולם " * 150
    one_word = "supercalifragilistic" * 5000  # one 100k-char token
    docs = spark.createDataFrame(
        [
            (0, big_doc, "en", "web", len(big_doc)),
            (1, emoji, "en", "web", len(emoji)),
            (2, rtl, "ar", "web", len(rtl)),
            (3, one_word, "en", "web", len(one_word)),
            (4, "normal words here for control purposes", "en", "web", 38),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(os.path.join(td, "documents.parquet"))
    for f in os.listdir("/root/testdata/sf0.001"):
        dst = os.path.join(td, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join("/root/testdata/sf0.001", f), dst)
    return td


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_completes_on_pathological_text(spark, path_sf, name):
    t0 = time.time()
    df = QUERIES[name](spark, path_sf)
    df.collect()
    release_cached(df)
    took = time.time() - t0
    assert took < WALL_BOUND_SECS, f"{name} took {took:.0f}s (quadratic?)"
