"""VERDICT r10 #6: multi-query retrieval shuffle fusion.

Two devices, values untouched (hash-gated in verify_local):
* one repartition by query_id feeds BOTH the per-query score
  aggregate and the rank-window cut (subset hash-partitioning
  satisfies ClusteredDistribution);
* `posting` is persisted: dfs and the scoring join both consume it,
  and unpersisted it planned its semi-join + tf aggregate TWICE.
"""

import re

from analyst_spark.plans.catalog import QUERIES

SF = "/root/testdata/sf0.001"


def _exchanges(spark, df):
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    sids, bids = set(), set()
    for line in plan.splitlines():
        for m in re.finditer(r"(Broadcast)?Exchange \((\d+)\)", line):
            (bids if m.group(1) else sids).add(int(m.group(2)))
    return sids, bids, plan


def test_bm25_multi_exchange_budget(spark):
    """Distinct shuffle exchanges stay at the fused count (was 10
    before r11). The budget is an upper bound so unrelated Catalyst
    changes don't flap it, but a reintroduced duplicate posting
    chain (+2) or a split agg/window exchange (+1) trips it."""
    from analyst_spark.functions.dedup import release_cached

    df = QUERIES["docs_bm25_multi"](spark, SF)
    sids, _bids, _plan = _exchanges(spark, df)
    release_cached(df)
    assert len(sids) <= 8, sorted(sids)


def test_hybrid_multi_exchange_budget(spark):
    from analyst_spark.functions.dedup import release_cached

    df = QUERIES["docs_rrf_hybrid_multi"](spark, SF)
    sids, bids, _plan = _exchanges(spark, df)
    release_cached(df)
    assert len(sids) <= 13, sorted(sids)
    assert len(bids) <= 6, sorted(bids)


def test_window_reuses_aggregate_partitioning(spark):
    """The rank window must sit directly on the aggregate with no
    exchange between them: in the formatted plan, the Sort feeding
    the Window's WindowGroupLimit is exchange-free above the final
    HashAggregate."""
    from analyst_spark.functions.dedup import release_cached

    df = QUERIES["docs_bm25_multi"](spark, SF)
    _s, _b, plan = _exchanges(spark, df)
    release_cached(df)
    tree = [
        line
        for line in plan.splitlines()
        if re.search(r"\+\- |:\- ", line) or line.strip().startswith("Window")
    ]
    # find the Window ... Sort ... HashAggregate run and assert no
    # Exchange line between Sort and the first HashAggregate below it
    text = "\n".join(tree)
    m = re.search(
        r"WindowGroupLimit.*\n(.*Sort.*)\n(.*\n)?.*HashAggregate", text
    )
    assert m, "plan shape changed; inspect"
    between = m.group(2) or ""
    assert "Exchange" not in between, between
