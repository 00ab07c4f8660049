"""BM25 retrieval (docs_bm25_topk): the Spark integer-micro scoring
must (a) EXACTLY equal a pure-Python replica of the integer
algorithm, and (b) approximate true float BM25 (k1=1.2, b=0.75,
idf=ln((N+1)/(df+0.5))) within the micro-rounding error bound — the
cross-engine hash gate alone can't catch a bug both engines share."""

import math
import os

import pytest
from pyspark.sql import functions as F

from analyst_spark.plans.catalog import QUERIES
from analyst_spark.plans.pipeline_plans import _BM25_QUERY, _BM25_TOP_K


CORPUS = [
    (0, "spark merge dup spark spark"),
    (1, "merge merge merge join scan filter"),
    (2, "dup line"),
    (3, "spark join"),
    (4, "nothing relevant here at all"),
    (5, "dup dup dup dup spark merge"),
    (6, ""),  # tokenless doc: excluded from N and the ranking
    # high-tf stress: drives the integer numerator idf*tf*22*T past
    # 1e17 — the replica computes in Python bignum, so equality
    # proves the Spark decimal(28,0) path loses no precision
    (7, " ".join(["dup"] * 200_000)),
]


def _tokens(text):
    return [w for w in text.split(" ") if w]


def _python_model():
    """Integer-micro replica + float reference, both from CORPUS."""
    lens = {d: len(_tokens(t)) for d, t in CORPUS if _tokens(t)}
    n_docs = len(lens)
    t_tokens = sum(lens.values())
    posting = {}
    for d, t in CORPUS:
        for w in _tokens(t):
            if w in _BM25_QUERY:
                posting[(d, w)] = posting.get((d, w), 0) + 1
    dfs = {}
    for (d, w) in posting:
        dfs[w] = dfs.get(w, 0) + 1
    micro, ref = {}, {}
    for (d, w), tf in posting.items():
        df = dfs[w]
        idf_micro = round(math.log((2 * n_docs + 2) / (2.0 * df + 1)) * 1e6)
        num = idf_micro * tf * 22 * t_tokens
        den = 10 * t_tokens * tf + 3 * t_tokens + 9 * lens[d] * n_docs
        micro[d] = micro.get(d, 0) + (2 * num + den) // (2 * den)
        idf = math.log((n_docs + 1) / (df + 0.5))
        k1, b = 1.2, 0.75
        ref[d] = ref.get(d, 0.0) + idf * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * lens[d] * n_docs / t_tokens)
        )
    order = sorted(micro, key=lambda d: (-micro[d], d))[:_BM25_TOP_K]
    return [(d, micro[d]) for d in order], ref


@pytest.fixture(scope="module")
def tiny_sf(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("bm25_sf"))
    docs = spark.createDataFrame(
        [(d, t, "en", "web", len(t)) for d, t in CORPUS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(os.path.join(td, "documents.parquet"))
    return td


def test_integer_scoring_matches_python_replica(spark, tiny_sf):
    got = [
        (r.doc_id, r.score_micro)
        for r in QUERIES["docs_bm25_topk"](spark, tiny_sf).collect()
    ]
    want, _ = _python_model()
    assert got == want


def test_micro_score_approximates_true_bm25(spark, tiny_sf):
    rows = QUERIES["docs_bm25_topk"](spark, tiny_sf).collect()
    _, ref = _python_model()
    for r in rows:
        # idf micro-rounding: <=0.5e-6 relative per term, amplified by
        # at most (k1+1)=2.2; plus 0.5e-6 from the final division
        bound = 2.2 * 0.5e-6 * len(_BM25_QUERY) + 0.5e-6
        assert abs(r.score - ref[r.doc_id]) <= bound + 1e-9, (
            r.doc_id, r.score, ref[r.doc_id]
        )


def test_ranking_sanity(spark, tiny_sf):
    """The rare term ('dup') must dominate: doc 5 (4x dup) outranks
    doc 1 (3x common 'merge'); the no-match doc never appears."""
    rows = QUERIES["docs_bm25_topk"](spark, tiny_sf).collect()
    ids = [r.doc_id for r in rows]
    assert 4 not in ids and 6 not in ids
    assert ids.index(5) < ids.index(1)
    assert all(a.score_micro >= b.score_micro for a, b in zip(rows, rows[1:]))


def test_bm25_plan_shape(spark):
    """Top-k must be TakeOrderedAndProject (no global sort) and the
    whole pipeline stays JVM-side (no Python eval nodes)."""
    import contextlib
    import io

    from analyst_spark.functions.dedup import release_cached

    df = QUERIES["docs_bm25_topk"](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    release_cached(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_idf_micro_half_boundary_margin():
    """LN-PARITY GUARD (r8 advice): idf_micro = round(ln(...)*1e6)
    is the one double-rounding in the scoring; the cross-engine gate
    assumes JVM Math.log and DuckDB libm log agree at that rounding.
    libm disagreement is ~1 ulp (~1e-9 absolute here), so the gate
    can only flake if some actual (df, N) pair puts ln(...)*1e6
    within that of a half-integer. Scan every pair the benchmark
    query produces at all three SFs and assert a >=1e-6 margin —
    1000x the hazard radius."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        con = duckdb.connect()
        terms = ", ".join(f"'{t}'" for t in _BM25_QUERY)
        rows = con.sql(
            f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM read_parquet('{path}')
            ), tok AS (SELECT * FROM toks WHERE w <> ''),
            n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok)
            SELECT w, count(DISTINCT doc_id) AS df, (SELECT n_docs FROM n)
            FROM tok WHERE w IN ({terms}) GROUP BY w
            """
        ).fetchall()
        con.close()
        assert rows, f"query terms select nothing at {sf}"
        for w, df, n_docs in rows:
            x = math.log((2 * n_docs + 2) / (2.0 * df + 1)) * 1e6
            dist = abs((x - math.floor(x)) - 0.5)
            assert dist >= 1e-6, (
                f"{sf} term={w} df={df} N={n_docs}: ln*1e6={x!r} is "
                f"{dist:.2e} from a rounding half-boundary"
            )


# --------------------------------------------- multi-query (r10)


def test_multi_query_q1_equals_single_query(spark):
    """q1 of the multi entry repeats the single entry's terms: the
    per-(doc, term) contributions are shared corpus properties, so
    wherever the two cuts overlap the scores must be IDENTICAL."""
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    single = QUERIES["docs_bm25_topk"](spark, sf)
    srows = {r.doc_id: r.score_micro for r in single.collect()}
    release_cached(single)
    multi = QUERIES["docs_bm25_multi"](spark, sf)
    mrows = {
        r.doc_id: (r.score_micro, r.rank)
        for r in multi.collect()
        if r.query_id == 1
    }
    release_cached(multi)
    assert mrows, "query 1 returned nothing"
    for doc_id, (score, rank) in mrows.items():
        assert srows.get(doc_id) == score, (doc_id, score, srows.get(doc_id))
    # ranks are 1..k' dense per query
    assert sorted(r for (_s, r) in mrows.values()) == list(
        range(1, len(mrows) + 1)
    )


def test_multi_query_dedupes_terms_and_bounds_k(spark):
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.functions.retrieval import bm25_topk_multi

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple cherry cherry"),
        ],
        ["doc_id", "text"],
    )
    # duplicate (query, term) rows must not double-count
    q = spark.createDataFrame(
        [(1, "apple"), (1, "apple"), (2, "cherry")],
        ["query_id", "term"],
    )
    out = bm25_topk_multi(docs, q, k=1)
    rows = {r.query_id: (r.doc_id, r.score_micro) for r in out.collect()}
    release_cached(out)
    assert set(rows) == {1, 2}
    q_nodup = spark.createDataFrame(
        [(1, "apple"), (2, "cherry")], ["query_id", "term"]
    )
    out2 = bm25_topk_multi(docs, q_nodup, k=1)
    rows2 = {r.query_id: (r.doc_id, r.score_micro) for r in out2.collect()}
    release_cached(out2)
    assert rows == rows2


def test_rrf_multi_q1_equals_single_hybrid_head(spark):
    """Query 1 of the multi-hybrid uses exactly the single entry's
    lexical terms AND its semantic query vector (vec 0), at the same
    candidate depth — so its fused ranking must equal the single
    entry's, row for row, down to the shorter cut."""
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    single = QUERIES["docs_rrf_hybrid"](spark, sf)
    srows = [
        (r.doc_id, r.bm25_rank, r.cos_rank, r.rrf_nano)
        for r in single.orderBy(F.desc("rrf_nano"), "doc_id").collect()
    ]
    release_cached(single)
    multi = QUERIES["docs_rrf_hybrid_multi"](spark, sf)
    mrows = [
        (r.doc_id, r.bm25_rank, r.cos_rank, r.rrf_nano)
        for r in multi.filter(F.col("query_id") == 1)
        .orderBy(F.desc("rrf_nano"), "doc_id")
        .collect()
    ]
    release_cached(multi)
    assert mrows, "query 1 fused nothing"
    n = min(len(srows), len(mrows))
    assert mrows[:n] == srows[:n]
