"""Round-8 additions: HLL distinct sketch entry.

events_distinct_users_hll is the 100 TB form of exact distinct —
fixed-size mergeable sketches instead of an expand over every
(group, user) pair. Its correctness story is a BOUND, not equality:
these tests pin the documented rsd at sf0.01 and the plan shape
(single aggregate, no expand)."""

from __future__ import annotations

from pyspark.sql import functions as F

from analyst_spark.plans.events_plans import (
    HLL_RSD,
    events_distinct_users,
    events_distinct_users_hll,
)

SF = "/root/testdata/sf0.01"


def test_hll_within_5_sigma_of_exact(spark):
    exact = {
        r.event_type: (r.n_users, r.n_events)
        for r in events_distinct_users(spark, SF).collect()
    }
    approx = {
        r.event_type: (r.n_users_approx, r.n_events)
        for r in events_distinct_users_hll(spark, SF).collect()
    }
    assert set(exact) == set(approx)
    for g, (n_users, n_events) in exact.items():
        a_users, a_events = approx[g]
        assert a_events == n_events, f"{g}: n_events must be exact"
        assert abs(a_users - n_users) <= 5 * HLL_RSD * n_users + 1, (
            f"{g}: approx={a_users} exact={n_users} outside 5*rsd"
        )


def test_hll_plan_has_single_group_shuffle(spark):
    """The exact form's distinct rewrite shuffles every distinct
    (event_type, user_id) pair — an Exchange keyed on user_id and a
    4-phase aggregate. The sketch form must plan exactly ONE exchange,
    keyed on the group alone, with no user_id in any partitioning —
    that per-user shuffle is exactly the scale cost the sketch
    removes."""
    exact_plan = events_distinct_users(spark, SF)._jdf.queryExecution().executedPlan().toString()
    hll_plan = events_distinct_users_hll(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(event_type" in exact_plan
    assert any(
        "user_id" in line
        for line in exact_plan.splitlines()
        if "Exchange" in line
    ), "exact distinct should shuffle (group, user) pairs"
    hll_exchanges = [l for l in hll_plan.splitlines() if "Exchange" in l]
    assert len(hll_exchanges) == 1, hll_plan
    assert "user_id" not in hll_exchanges[0]


def test_hll_exact_on_tiny_cardinalities(spark):
    """HLL++ is exact at small cardinalities (sparse mode) — a
    deterministic pin, not a band."""
    df = spark.createDataFrame(
        [("a", i % 3) for i in range(50)] + [("b", 7)],
        "event_type STRING, user_id INT",
    )
    got = {
        r.event_type: r.n
        for r in df.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("n"))
        .collect()
    }
    assert got == {"a": 3, "b": 1}


def test_streaming_hll_bitwise_equals_batch(spark):
    """Batch/stream sketch unification: HLL register merge is a
    per-register max (order-independent), so the streaming run over
    arbitrary micro-batch boundaries must produce BIT-IDENTICAL
    estimates to the one-pass batch aggregation — an exact pin, not
    a band."""
    from analyst_spark.plans.streaming_plans import (
        streaming_distinct_users_hll,
    )
    from analyst_spark.tables import load_tables

    stream = streaming_distinct_users_hll(spark, SF)
    ev = load_tables(spark, SF)["events"]
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias(
                "n_users_approx"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.unix_micros("w.start").alias("hour_us"),
            "event_type",
            "n_users_approx",
            "n_events",
        )
    )
    assert stream.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream).count() == 0


def test_streaming_cms_blob_bitwise_equals_batch(spark):
    """CMS merge is element-wise counter addition (commutative,
    associative), so the sketch built across arbitrary micro-batch
    boundaries must be BYTE-IDENTICAL to the one built by the batch
    aggregation — and hence every estimate the entries emit matches
    exactly, not just within the band."""
    import shutil
    import tempfile

    from analyst_spark.plans.pipeline_plans import (
        _CMS_CONF,
        _CMS_EPS,
        _CMS_SEED,
    )
    from analyst_spark.plans.streaming_plans import (
        _await_or_raise,
        run_to_memory_sink,
    )
    from analyst_spark.tables import load_tables

    docs = load_tables(spark, SF)["documents"]

    def sketch_agg(df):
        return df.select(
            F.explode(F.split(F.col("text"), " ")).alias("token")
        ).filter(F.col("token") != "").agg(
            F.count_min_sketch(
                "token", F.lit(_CMS_EPS), F.lit(_CMS_CONF), F.lit(_CMS_SEED)
            ).alias("cms")
        )

    batch_blob = bytes(sketch_agg(docs.select("text")).collect()[0].cms)

    tmp = tempfile.mkdtemp(prefix="asp_cms_pin_")
    try:
        # 8 files at 2/trigger => 4 micro-batch boundaries under
        # availableNow (maxFilesPerTrigger is honored as the batch
        # size hint)
        docs.select("doc_id", "text").coalesce(8).write.mode("overwrite").json(tmp)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "2")
            .json(tmp)
        )
        q = run_to_memory_sink(
            sketch_agg(stream), "cms_pin_sink", output_mode="complete"
        )
        _await_or_raise(q)
        stream_blob = bytes(spark.table("cms_pin_sink").collect()[0].cms)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert stream_blob == batch_blob


def test_streaming_heavy_hitters_matches_batch_entry(spark):
    """The full streaming entry (exact head + stream-built sketch)
    must equal the batch entry row-for-row at the same SF."""
    from analyst_spark.plans.pipeline_plans import text_heavy_hitters_cms
    from analyst_spark.plans.streaming_plans import streaming_heavy_hitters_cms

    got = sorted(map(tuple, streaming_heavy_hitters_cms(spark, SF).collect()))
    want = sorted(map(tuple, text_heavy_hitters_cms(spark, SF).collect()))
    assert got == want
