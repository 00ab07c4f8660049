"""Training-data curation plans: contamination, PII, repetition,
vocabulary. Semantics asserted at sf0.001; oracle parity is covered
by the verify gate (tools/verify_local.py)."""

import contextlib
import io

from analyst_spark.plans.pipeline_plans import (
    _BENCH_MOD,
    contamination_ngram,
    text_pii_scan,
    text_repetition,
    text_top_tokens,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_contamination_flags_benchmark_members_and_only_high_overlap(spark):
    rows = contamination_ngram(spark, SF).collect()
    flagged = {r.doc_id: r for r in rows}
    # every benchmark member long enough to have 8-grams self-flags at 1.0
    from analyst_spark.tables import load_tables

    bench_ids = [
        r.doc_id
        for r in load_tables(spark, SF)["documents"].select("doc_id").collect()
        if r.doc_id % _BENCH_MOD == 0
    ]
    for did in bench_ids:
        assert did in flagged and flagged[did].overlap_ratio == 1.0
    # anything else flagged genuinely crossed the threshold (the
    # synthetic docs share phrase chunks, so near-copies can flag too)
    for r in rows:
        assert r.overlap_ratio >= 0.5
        assert 0 < r.n_matched <= r.n_ngrams


def test_contamination_benchmark_side_is_broadcast(spark):
    plan = _plan(contamination_ngram(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pii_scan_counts_the_planted_set(spark):
    rows = text_pii_scan(spark, SF).collect()
    total = {c: sum(getattr(r, c) for r in rows)
             for c in ("n_docs", "docs_with_email", "total_emails",
                       "docs_with_phone", "total_phones", "total_removed_chars")}
    n = total["n_docs"]
    # plant density: one email per doc_id%7==0, one phone per doc_id%11==0
    assert total["total_emails"] == total["docs_with_email"] == (n + 6) // 7
    assert total["total_phones"] == total["docs_with_phone"] == (n + 10) // 11
    # every planted email is 'user<id>@example.com' (>= 17 chars), each
    # phone is 8 chars — removal accounting must cover all of them
    assert total["total_removed_chars"] >= 17 * total["total_emails"] + 8 * total["total_phones"]


def test_pii_scan_is_map_side_only(spark):
    plan = _plan(text_pii_scan(spark, SF))
    assert "Join" not in plan  # pure scan + aggregate
    # exactly one shuffle: the final group-by-source ("formatted"
    # prints each node twice — tree and details)
    assert plan.count(") Exchange") == 1


def test_repetition_ratios_are_consistent(spark):
    rows = text_repetition(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_dup3 <= r.n_gram3
        assert abs(r.dup3_ratio - r.n_dup3 / max(r.n_gram3, 1)) < 1e-6
    # word salad over a small vocabulary: some doc repeats a 2-gram
    assert any(r.n_dup2 > 0 for r in rows)


def test_repetition_has_no_shuffle(spark):
    plan = _plan(text_repetition(spark, SF))
    assert "Exchange" not in plan  # map-only over the scan


def test_top_tokens_shape_and_determinism(spark):
    rows = text_top_tokens(spark, SF).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        assert [r.rnk for r in sorted(rs, key=lambda r: r.rnk)] == list(
            range(1, len(rs) + 1)
        )
        assert len(rs) <= 5
        # ranks follow (count desc, token asc)
        rs = sorted(rs, key=lambda r: r.rnk)
        for a, b in zip(rs, rs[1:]):
            assert (a.cnt, b.token) >= (b.cnt, a.token) or a.cnt > b.cnt
    assert text_top_tokens(spark, SF).collect() == rows  # stable rerun


def test_pack_sequences_invariants(spark):
    from pyspark.sql import functions as F

    from analyst_spark.plans.pipeline_plans import _SEQ_LEN, docs_pack_sequences
    from analyst_spark.tables import load_tables

    rows = sorted(
        docs_pack_sequences(spark, SF).collect(), key=lambda r: r.seq_id
    )
    # contiguous sequence ids from 0
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    # doc ranges are ordered and non-overlapping across sequences
    for a, b in zip(rows, rows[1:]):
        assert a.last_doc < b.first_doc
    # token accounting is exact: every token lands in exactly one seq
    docs = load_tables(spark, SF)["documents"]
    total = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0].t
    assert sum(r.n_tokens for r in rows) == total
    # a sequence holds roughly SEQ_LEN tokens: every non-tail sequence
    # crosses its boundary only by the straddling document's tail
    max_doc_toks = docs.select(
        F.max(F.size(F.split("text", " "))).alias("m")
    ).collect()[0].m
    for r in rows[:-1]:
        assert r.n_tokens >= _SEQ_LEN - max_doc_toks
        assert r.n_tokens <= _SEQ_LEN + max_doc_toks


def test_winnow_short_document_edges(spark):
    """k=5, w=4: 4 tokens → no k-grams → empty selection; 5 tokens →
    one k-gram (< window) → that single hash; 8 tokens → exactly one
    window; 9 tokens → two windows."""
    from analyst_spark.plans.pipeline_plans import winnow_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),                  # 0 k-grams
            (2, "a b c d e"),                # 1 k-gram
            (3, "a b c d e f g h"),          # 4 k-grams = 1 window
            (4, "a b c d e f g h i"),        # 5 k-grams = 2 windows
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in winnow_stats(docs).collect()}
    assert (got[1].n_kgrams, got[1].n_selected, got[1].min_fp) == (0, 0, None)
    assert (got[2].n_kgrams, got[2].n_selected, got[2].n_distinct) == (1, 1, 1)
    assert (got[3].n_kgrams, got[3].n_selected) == (4, 1)
    assert (got[4].n_kgrams, got[4].n_selected) == (5, 2)
    # the selected fingerprint of doc 2 is the md5 of its only k-gram
    import hashlib

    assert got[2].min_fp == hashlib.md5(b"a b c d e").hexdigest()


def test_lm_score_matches_hand_model(spark):
    """Bigram add-k LM on a 3-doc toy corpus vs a hand-computed
    python model (same micro-log snapping)."""
    import math
    from collections import Counter

    from analyst_spark.plans.pipeline_plans import _LM_K, docs_lm_score

    texts = {0: "a b a b", 1: "a b c", 2: "c c"}
    toks = {d: t.split() for d, t in texts.items()}
    uni: Counter = Counter(w for t in toks.values() for w in t)
    big: Counter = Counter(
        (t[i], t[i + 1]) for t in toks.values() for i in range(len(t) - 1)
    )
    v = len(uni)
    want = {}
    for d, t in toks.items():
        micros = [
            round(
                math.log((big[(t[i], t[i + 1])] + _LM_K) / (uni[t[i]] + _LM_K * v))
                * 1e6
            )
            for i in range(len(t) - 1)
        ]
        n, s = len(micros), sum(micros)
        want[d] = (n, s, round(-(s / 1e6) / n, 6), round(math.exp(-(s / 1e6) / n), 4))

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(
            [(d, t, "en", "s", len(t)) for d, t in texts.items()],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.doc_id: (r.n_bigrams, r.sum_micro_logprob, r.neg_avg_logprob, r.ppl)
            for r in docs_lm_score(spark, td).collect()
        }
    assert got == want
    # a repeated-bigram doc is more probable than a one-off doc
    assert got[0][3] < got[1][3]


def test_gopher_filter_rules(spark):
    """Each rule trips on a crafted violator; the clean doc keeps."""
    import os
    import tempfile

    from analyst_spark.plans.pipeline_plans import docs_gopher_filter

    rows = {
        0: "the quick brown fox and that dog have fun with all of it",  # clean
        1: "of the and",                                  # too short
        2: "the of " + "supercalifragilistic " * 12,      # mean word len too high
        3: "the of " + "### ### ### ### ### ### ### ### ### ###",  # symbols
        4: "zz yy xx ww vv uu tt ss rr qq pp oo",         # no stopwords
    }
    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(
            [(d, t, "en", "s", len(t)) for d, t in rows.items()],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        got = {r.doc_id: r for r in docs_gopher_filter(spark, td).collect()}
    assert got[0].keep
    assert not got[1].keep and got[1].n_words < 10
    assert not got[2].keep and got[2].mean_word_len > 10
    assert not got[3].keep and got[3].symbol_word_ratio > 0.1
    assert not got[4].keep and got[4].n_stopwords == 0
    assert got[3].alpha_word_ratio < 1.0


def test_dsir_weights_favor_target_domain(spark):
    """Importance weights must rank target-domain (en) documents above
    out-of-domain ones on average, and weights are positive."""
    from pyspark.sql import functions as F

    from analyst_spark.plans.pipeline_plans import docs_dsir_weights
    from analyst_spark.tables import load_tables

    sf = "/root/testdata/sf0.001"
    w = docs_dsir_weights(spark, sf)
    docs = load_tables(spark, sf)["documents"].select("doc_id", "lang")
    by_lang = (
        w.join(docs, "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("weight").alias("aw"))
        .collect()
    )
    m = {r[0]: r.aw for r in by_lang}
    assert m[True] > m[False]
    assert w.filter(F.col("weight") <= 0).count() == 0


def test_dup_span_counts_cross_doc_spans_only(spark):
    """A 6-gram shared by two docs counts in both; a doc repeating its
    own 6-gram with no other holder stays clean."""
    import os
    import tempfile

    from analyst_spark.plans.pipeline_plans import docs_dup_span

    span = "w1 w2 w3 w4 w5 w6"
    rows = {
        0: span + " tail0 a b",          # shares span with doc 1
        1: "head1 " + span + " x",       # shares span with doc 0
        2: span.replace("w1", "q1") + " " + span.replace("w1", "q1"),  # self-repeat only
        3: "just some other words here now",
    }
    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(
            [(d, t, "en", "s", len(t)) for d, t in rows.items()],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        got = {r.doc_id: r for r in docs_dup_span(spark, td).collect()}
    assert got[0].n_dup >= 1 and got[1].n_dup >= 1
    assert got[2].n_dup == 0  # same-doc repetition is not cross-doc duplication
    assert got[3].n_dup == 0 and got[3].dup_ratio == 0.0
    assert got[0].n_ngrams == 4  # 9 tokens -> 4 six-grams


def test_curation_funnel_monotone(spark):
    """Stages only ever shrink, raw matches the corpus, and each
    stage's counts agree with recomputing its predicate directly."""
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.plans.pipeline_plans import docs_curation_funnel

    sf = "/root/testdata/sf0.001"
    out = docs_curation_funnel(spark, sf)
    rows = {r.stage: r for r in out.collect()}
    release_cached(out)
    assert list(sorted(rows)) == ["dedup", "gopher", "lm", "raw"]
    assert (
        rows["raw"].n_docs
        >= rows["gopher"].n_docs
        >= rows["dedup"].n_docs
        >= rows["lm"].n_docs
    )
    assert (
        rows["raw"].n_tokens
        >= rows["gopher"].n_tokens
        >= rows["dedup"].n_tokens
        >= rows["lm"].n_tokens
    )
    from analyst_spark.tables import load_tables

    assert rows["raw"].n_docs == load_tables(spark, sf)["documents"].count()
    assert rows["lm"].n_docs > 0  # the chain keeps a nontrivial corpus


def test_bpe_tokenize_pack_invariants(spark):
    """End-to-end tokenizer path: BPE token totals are conserved into
    the packed sequences, seq ids are contiguous, doc ranges ordered,
    and BPE packing differs from whitespace packing only via the
    token counts (same placement machinery)."""
    from pyspark.sql import functions as F

    from analyst_spark.functions.bpe import bpe_encode_pandas, bpe_train
    from analyst_spark.plans.pipeline_plans import (
        _TOKPACK_BATCH,
        _TOKPACK_MERGES,
        docs_bpe_tokenize_pack,
    )
    from analyst_spark.tables import load_tables, spread

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        docs_bpe_tokenize_pack(spark, sf).collect(), key=lambda r: r.seq_id
    )
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    for a, b in zip(rows, rows[1:]):
        assert a.last_doc < b.first_doc
    docs = spread(load_tables(spark, sf)["documents"], "doc_id")
    merges = bpe_train(docs, num_merges=_TOKPACK_MERGES, batch=_TOKPACK_BATCH)
    total = docs.select(
        F.sum(F.size(bpe_encode_pandas("text", merges))).alias("t")
    ).collect()[0].t
    assert sum(r.n_bpe_tokens for r in rows) == total
    assert len(rows) >= 2  # corpus spans multiple 512-token sequences


def test_dedup_spans_cuts_long_runs_keeps_short_overlaps(spark, tmp_path):
    """docs_dedup_spans: a >=8-token span shared across docs is
    removed from BOTH carriers; a shared 6-gram that doesn't extend
    to an 8-token covered run survives; unique text is untouched."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens
    docs = [
        (1, f"unique one two three {shared} tail1 tailb tailc tdone"),
        (2, f"other prefix words here {shared} postfix pw2 pw3 pw4"),
        # doc 3/4 share only one 6-gram (6 covered tokens < 8): kept
        (3, "p q r s t u v w x y z"),
        (4, "m n o p q r s t u aa bb"),  # shares 6-gram "p q r s t u"
    ]
    import os

    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.plans.pipeline_plans import docs_dedup_spans

    df = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in docs],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "documents.parquet"))
    out = docs_dedup_spans(spark, str(tmp_path))
    rows = {r.doc_id: r for r in out.collect()}
    release_cached(out)
    # the 10-token shared span is removed from both docs 1 and 2
    assert rows[1].n_removed == 10 and rows[2].n_removed == 10
    # the shared 6-gram between 3 and 4 covers only 6 tokens (< 8): kept
    assert rows[3].n_removed == 0 and rows[4].n_removed == 0
    import hashlib

    clean1 = "unique one two three tail1 tailb tailc tdone"
    assert rows[1].clean_md5 == hashlib.md5(clean1.encode()).hexdigest()
