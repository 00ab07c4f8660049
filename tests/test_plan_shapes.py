"""Physical-plan regression tests: the scale properties SCALE.md
claims are asserted here so a future edit can't silently regress them
(planning only — nothing executes)."""

import contextlib
import io

import pytest

from analyst_spark.plans.catalog import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize(
    "name",
    ["q3_shipping_priority", "q5_local_supplier", "q7_volume_shipping",
     "q9_product_profit", "q10_returned_items", "lookup_inner"],
)
def test_fact_joins_broadcast_only(spark, name):
    plan = _plan(QUERIES[name](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name,fragment",
    [
        ("q1_pricing_summary", "LessThanOrEqual(l_shipdate"),
        ("q6_revenue_change", "GreaterThanOrEqual(l_shipdate"),
        ("q4_priority_semi", "EqualTo(l_returnflag,R)"),
    ],
)
def test_filters_reach_parquet_scan(spark, name, fragment):
    plan = _plan(QUERIES[name](spark, SF))
    assert fragment in plan, f"filter not pushed in {name}"


def test_dedup_plans_have_no_cartesian(spark):
    for name in ["dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard"]:
        plan = _plan(QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name",
    ["q12_late_shipments", "q16_supplier_part_counts",
     "q20_volume_suppliers"],
)
def test_tpch_rest_broadcast_only(spark, name):
    plan = _plan(QUERIES[name](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_q2_dims_broadcast_agg_join_unpinned(spark):
    """q2's dimension joins broadcast via file statistics (no hints);
    the join back to the per-part MIN aggregate has no size statistic,
    so the static plan conservatively sort-merges it — AQE converts at
    runtime when the aggregate is small. What must never appear is a
    cartesian product."""
    plan = _plan(QUERIES["q2_min_cost_supplier"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q21_self_join_copartitions_on_orderkey(spark):
    # the lineitem self-join may shuffle, but only on l_orderkey (its
    # natural key) — and supplier/nation stay broadcast
    plan = _plan(QUERIES["q21_last_to_ship"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q16_distinct_aggregation_two_phase(spark):
    plan = _plan(QUERIES["q16_supplier_part_counts"](spark, SF))
    # COUNT(DISTINCT) must expand to partial aggregation before the
    # exchange, not a single-phase global distinct
    assert "partial" in plan.lower()


def test_q1_scan_prunes_columns(spark):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, SF))
    # ReadSchema on the lineitem scan must not include unused columns
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read and "l_partkey" not in read[0] and "l_suppkey" not in read[0]


def test_moving_avg_single_window_exchange(spark):
    # both frames (moving + cumulative) share one partitionBy/orderBy
    # → exactly one Window node over one Exchange, not two sorts
    plan = _plan(QUERIES["events_moving_avg"](spark, SF))
    tree = plan.split("(1) Scan")[0]
    assert tree.count("Window") == 1
    assert tree.count("Exchange") == 1


def test_upsert_no_cartesian_and_single_scan_shape(spark):
    plan = _plan(QUERIES["orders_merge_upsert"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "Union" in plan


def test_bucketed_gate_entry_join_has_no_exchange(spark):
    """The catalog's bucketed_colocated_join must actually hit the
    co-located path: after the bucketed tables are written, the
    sort-merge join stage contains no Exchange on either side."""
    df = QUERIES["bucketed_colocated_join"](spark, SF)
    plan = _plan(df)
    assert "SortMergeJoin" in plan
    # the only allowed exchange is the post-join aggregation's (keyed
    # on o_orderpriority); a shuffle of either join INPUT would hash
    # on the join key instead
    assert "hashpartitioning(orderkey" not in plan, (
        "bucketed join shuffled an input"
    )


def test_token_budget_mix_no_single_partition_corpus_sort(spark):
    """The mixture sampler must use the bucketed prefix sum: no window
    sorts a whole language in one partition (the tiny bucket-bases
    window is exempt — it sorts langs x buckets rows)."""
    plan = _plan(QUERIES["docs_token_budget_mix"](spark, SF))
    # per-(lang,bucket) partitioning present => corpus window is bucketed
    assert "hashpartitioning(lang" in plan and "bucket" in plan


def test_anomaly_zscore_stats_broadcast_no_window(spark):
    """Per-type stats ride a broadcast join back onto the fact scan —
    no window (which would sort per type) and no SMJ."""
    from analyst_spark.functions.dedup import release_cached

    df = QUERIES["events_anomaly_zscore"](spark, SF)
    plan = _plan(df)
    release_cached(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_lm_entries_no_cartesian_beyond_scalar(spark):
    """docs_lm_score / docs_dsir_weights: the only nested-loop join is
    the 1-row scalar cross join; no CartesianProduct."""
    from analyst_spark.functions.dedup import release_cached

    for name in ("docs_lm_score", "docs_dsir_weights"):
        df = QUERIES[name](spark, SF)
        plan = _plan(df)
        release_cached(df)
        assert "CartesianProduct" not in plan, name
        # "formatted" prints each node twice (tree + details); count
        # the numbered headers only
        assert plan.count(") BroadcastNestedLoopJoin") <= 1, name


def test_gopher_and_scrub_are_map_side(spark):
    """Rule battery and redaction are scan+project: exactly zero
    joins; scrub adds no shuffle at all."""
    plan = _plan(QUERIES["docs_gopher_filter"](spark, SF))
    assert "Join" not in plan
    plan = _plan(QUERIES["docs_pii_scrub"](spark, SF))
    assert "Join" not in plan and "Exchange" not in plan


def test_dup_span_no_cartesian(spark):
    from analyst_spark.functions.dedup import release_cached

    df = QUERIES["docs_dup_span"](spark, SF)
    plan = _plan(df)
    release_cached(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan


def test_global_shuffle_single_exchange(spark):
    """seeded_shuffle's contract: ONE exchange (the window's
    partitionBy), no join, no global sort of the corpus — the
    SCALE.md claim the r12 plan audit records."""
    plan = _plan(QUERIES["docs_global_shuffle"](spark, SF))
    # count numbered node headers, not tree+details duplicates
    assert plan.count(") Exchange") == 1, plan
    assert "Join" not in plan
    assert plan.count(") Window") == 1


def test_curriculum_pack_reuses_tier_shard_exchange(spark):
    """VERDICT r13 #5's plan pin: the pack's prefix sum buckets BY
    (tier, shard), so the corpus-sized exchanges are exactly the
    curriculum window's (tier, shard) hash partition (reused by the
    group-totals aggregation) plus the final per-seq aggregation; the
    group-totals side is tiers × shards rows under one bounded
    single-partition window. Bases join back as a broadcast — no
    CartesianProduct, no sort-merge join."""
    from analyst_spark.functions.dedup import release_cached

    df = QUERIES["docs_curriculum_pack"](spark, SF)
    plan = _plan(df)
    release_cached(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # ONE corpus-partitioning Window node (off+pos share partition AND
    # order, Catalyst fuses them) + ONE bounded totals Window
    assert plan.count(") Window") == 2, plan


def test_shuffled_pack_no_extra_corpus_exchange(spark):
    """The pack's prefix sum buckets BY SHARD, so the corpus-sized
    exchanges are exactly: the shuffle's shard partition (reused by
    the within-shard window) plus the final per-seq aggregation;
    the shard-totals side is 16 rows. No CartesianProduct, no
    sort-merge join (bases join broadcasts)."""
    plan = _plan(QUERIES["docs_shuffled_pack"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_quantized_rerank_narrow_window_broadcast_rerank(spark):
    """ann_quantized_rerank's scale contract: the candidate window
    shuffles only (query_id, vec_id, q_score) — the 64-wide float
    vector must NOT ride through the top-C exchange — and the rerank
    stage fetches finalist vectors via broadcast joins (no
    SortMergeJoin, no CartesianProduct anywhere)."""
    plan = _plan(QUERIES["ann_quantized_rerank"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # The window exchanges (hashpartitioning on query_id) must carry
    # only narrow columns — codes and vectors are projected away
    # before the top-C cut. The one exchange allowed to carry the raw
    # vector is the spread() scan-balancer (REPARTITION_BY_NUM on
    # vec_id), which exists because driver testdata ships one row
    # group per table.
    lines = plan.splitlines()
    checked = 0
    for i, l in enumerate(lines):
        if "Exchange" in l and l.strip().startswith("("):
            block = "\n".join(lines[i : i + 3])
            if "hashpartitioning(query_id" in block:
                checked += 1
                assert "embedding" not in block and "__cq" not in block, (
                    "wide column crossed a window exchange:\n" + block
                )
    assert checked >= 1, "no query_id window exchange found — plan changed"


def test_perplexity_buckets_bounded_window_broadcast_back(spark):
    """docs_perplexity_buckets' scale contract: the tertile cuts are
    TWO Window nodes (running cum_excl + per-lang total — distinct
    frames, so Catalyst keeps them separate) over the bounded
    per-(lang, qbin) histogram, and the bucket table joins back to
    the corpus as a BROADCAST. No per-language corpus sort, no
    CartesianProduct (the LM scorer's vocab scalar rides a
    BroadcastNestedLoopJoin, which is allowed)."""
    from analyst_spark.functions.dedup import release_cached

    df = QUERIES["docs_perplexity_buckets"](spark, SF)
    plan = _plan(df)
    release_cached(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count(") Window") == 2, plan
