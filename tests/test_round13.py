"""Round-13 additions: delta decontamination (eval-suite update) and
curriculum ordering (quality tiers × seeded shuffle).

Both are hash-gated vs DuckDB in tools/verify_local.py; these tests
pin the CLAIMS the gate can't see — membership exclusions, the
tier/keep relation, per-(tier, shard) permutation structure, and the
differential behavior on planted mini-corpora."""

import pytest
from pyspark.sql import functions as F

from analyst_spark.plans import pipeline_plans as pp
from tests.conftest import SF_DIR


def _write_docs(spark, tmp_path, rows):
    td = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{td}/documents.parquet")
    return td


def test_contamination_delta_excludes_all_bench_members(spark):
    out = pp.contamination_delta(spark, SF_DIR)
    bad = out.filter(
        (F.col("doc_id") % pp._BENCH_MOD == 0)
        | (F.col("doc_id") % pp._BENCH_MOD2 == 0)
    ).count()
    assert bad == 0
    assert out.count() > 0  # the synthetic corpus plants delta hits


def test_contamination_delta_differential(spark, tmp_path):
    """Planted mini-corpus: a training doc copying a V2-ONLY bench doc
    is returned; a training doc copying a V1 bench doc is NOT (its
    grams are old news); unrelated docs are not returned."""
    m1, m2 = pp._BENCH_MOD, pp._BENCH_MOD2
    v1_text = " ".join(f"alpha{i}" for i in range(16))
    v2_text = " ".join(f"beta{i}" for i in range(16))
    rows = [
        (m1, v1_text),            # v1 bench member
        (m2, v2_text),            # v2-only bench member
        (1, v1_text),             # copies v1 -> old grams, NOT returned
        (2, v2_text),             # copies v2-only -> returned
        (3, " ".join(f"gamma{i}" for i in range(16))),  # unrelated
    ]
    td = _write_docs(spark, tmp_path, rows)
    got = sorted(r.doc_id for r in pp.contamination_delta(spark, td).collect())
    assert got == [2]


def test_curriculum_order_structure_and_tier_semantics(spark):
    out = pp.docs_curriculum_order(spark, SF_DIR).persist()
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n_docs = docs.count()
        # every document exactly once, tiers in range
        assert out.count() == n_docs
        assert out.select("doc_id").distinct().count() == n_docs
        assert out.filter(
            (F.col("tier") < 0) | (F.col("tier") > 5)
        ).count() == 0
        # pos is a contiguous 1..n permutation within every
        # (tier, shard) cell
        cells = out.groupBy("tier", "shard_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.countDistinct("pos").alias("nd"),
        )
        for r in cells.collect():
            assert (r["lo"], r["hi"], r["nd"]) == (1, r["n"], r["n"]), r
        # tier == 5 is EXACTLY the Gopher keep set (the rules are the
        # same battery, so passing all five == keep)
        keep_ids = {
            r.doc_id
            for r in pp.docs_gopher_filter(spark, SF_DIR)
            .filter("keep")
            .collect()
        }
        tier5_ids = {
            r.doc_id for r in out.filter(F.col("tier") == 5).collect()
        }
        assert tier5_ids == keep_ids
        # more than one tier populated (a single band would make the
        # curriculum vacuous on this corpus)
        assert out.select("tier").distinct().count() >= 2
    finally:
        out.unpersist()


def test_curriculum_order_deterministic(spark):
    tup = lambda df: sorted(tuple(r) for r in df.collect())
    a = tup(pp.docs_curriculum_order(spark, SF_DIR))
    b = tup(pp.docs_curriculum_order(spark, SF_DIR))
    assert a == b


def test_streaming_contamination_delta_twin_row_identical(spark):
    from analyst_spark.plans import streaming_plans as st

    tup = lambda df: sorted(
        tuple(r)
        for r in df.select(
            "doc_id", "n_ngrams", "n_matched", "overlap_ratio"
        ).collect()
    )
    batch = tup(pp.contamination_delta(spark, SF_DIR))
    stream = tup(st.streaming_contamination_delta(spark, SF_DIR))
    assert stream == batch
    assert len(batch) > 0
