"""Structured Streaming tests: file source → watermarked windows /
session windows / custom stateful op → memory sink, driven with the
availableNow trigger (bounded, deterministic)."""

import json
import os

import pytest

from analyst_spark.streaming.events import (
    hourly_rollup_stream,
    read_events_stream,
    run_to_memory_sink,
    sessionize_stream,
)
from analyst_spark.streaming.stateful import running_user_totals


def _write_batch(path, rows):
    with open(path, "w") as f:
        for eid, ts, uid, et, v in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": eid,
                        "ts": ts,
                        "user_id": uid,
                        "event_type": et,
                        "value": v,
                        "props": "{}",
                    }
                )
                + "\n"
            )


@pytest.fixture()
def events_dir(tmp_path):
    """Two file drops. batch2 carries a far-future 'flush' event so the
    watermark (computed from batch1's max event time only after batch1
    commits) advances past every Jan-1 window, letting append mode emit
    the closed windows — i.e., this fixture tests real watermark
    semantics, not just the happy path."""
    p = tmp_path / "events"
    p.mkdir()
    _write_batch(
        p / "batch1.json",
        [
            # two users, two hours, one late-ish event
            (1, "2024-01-01T10:05:00", 1, "view", 10.0),
            (2, "2024-01-01T10:20:00", 1, "view", 20.0),
            (3, "2024-01-01T11:10:00", 1, "click", 30.0),
            (4, "2024-01-01T10:40:00", 2, "view", 40.0),
            (5, "2024-01-01T12:30:00", 2, "click", 50.0),
        ],
    )
    _write_batch(
        p / "batch2.json",
        [(99, "2024-01-02T00:00:00", 99, "flush", 0.0)],
    )
    return str(p)


def test_hourly_rollup_stream(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    q = run_to_memory_sink(hourly_rollup_stream(stream), "rollup_test")
    assert q.awaitTermination(120)
    out = {
        (r.hour.hour, r.event_type): (r.n_events, r.avg_value)
        for r in spark.sql("SELECT * FROM rollup_test").collect()
    }
    assert out[(10, "view")] == (3, 23.3333)
    assert out[(11, "click")] == (1, 30.0)
    assert out[(12, "click")] == (1, 50.0)


def test_sessionize_stream(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    q = run_to_memory_sink(sessionize_stream(stream, gap_minutes=30), "sess_test")
    assert q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_test").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.n_events)
    # user 1: 10:05 + 10:20 merge (gap 15m), 11:10 separate
    assert sorted(by_user[1]) == [1, 2]
    # user 2: 10:40 and 12:30 are separate sessions
    assert sorted(by_user[2]) == [1, 1]


def test_dedup_stream(spark, tmp_path):
    from analyst_spark.streaming.dedup import dedup_stream

    p = tmp_path / "dups"
    p.mkdir()
    # same event_id appears in both batches; second occurrence drops
    _write_batch(p / "b1.json", [
        (1, "2024-01-01T10:00:00", 1, "view", 1.0),
        (2, "2024-01-01T10:01:00", 1, "view", 2.0),
    ])
    _write_batch(p / "b2.json", [
        (1, "2024-01-01T10:00:00", 1, "view", 1.0),   # replay
        (3, "2024-01-01T10:02:00", 2, "click", 3.0),
    ])
    stream = read_events_stream(spark, str(p), max_files_per_trigger=1)
    q = run_to_memory_sink(dedup_stream(stream), "dedup_test")
    assert q.awaitTermination(120)
    ids = sorted(
        r.event_id for r in spark.sql("SELECT * FROM dedup_test").collect()
    )
    assert ids == [1, 2, 3]


def test_dedup_stream_by_content(spark, tmp_path):
    from analyst_spark.streaming.dedup import dedup_stream_by_content

    p = tmp_path / "content"
    p.mkdir()
    # event 4 re-sends event 1's payload under a fresh id
    _write_batch(p / "b1.json", [
        (1, "2024-01-01T10:00:00", 1, "view", 1.0),
        (4, "2024-01-01T10:00:00", 1, "view", 1.0),
        (2, "2024-01-01T10:01:00", 1, "view", 2.0),
    ])
    stream = read_events_stream(spark, str(p))
    q = run_to_memory_sink(
        dedup_stream_by_content(stream, ["user_id", "event_type", "value", "ts"]),
        "dedup_content_test",
    )
    assert q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM dedup_content_test").collect()
    assert len(rows) == 2
    assert sorted(r.value for r in rows) == [1.0, 2.0]


def test_running_user_totals_stateful(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    # expire=False: a bounded availableNow replay must terminate; with
    # timers armed the query would idle waiting to fire them
    q = run_to_memory_sink(
        running_user_totals(stream, expire=False), "totals_test", output_mode="update"
    )
    assert q.awaitTermination(120), "bounded stateful query must terminate"
    rows = spark.sql(
        "SELECT user_id, max(n_events) AS n, max(total_value) AS t "
        "FROM totals_test GROUP BY user_id"
    ).collect()
    got = {r.user_id: (r.n, r.t) for r in rows}
    assert got[1] == (3, 60.0)
    assert got[2] == (2, 90.0)


def test_stream_stream_attribution_join(spark, events_dir):
    from analyst_spark.streaming.joins import view_click_attribution_stream

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    views = stream.filter(stream.event_type == "view")
    clicks = stream.filter(stream.event_type == "click")
    q = run_to_memory_sink(
        view_click_attribution_stream(views, clicks, max_gap="90 minutes"),
        "attr_test",
    )
    assert q.awaitTermination(120)
    pairs = {
        (r.view_id, r.click_id)
        for r in spark.sql("SELECT * FROM attr_test").collect()
    }
    # user 1: click 11:10 within 90m of views 10:05 and 10:20
    # user 2: click 12:30 within 90m of view 10:40? gap=110m -> excluded
    assert pairs == {(1, 3), (2, 3)}


def test_stream_to_partitioned_lake_foreachbatch(spark, events_dir, tmp_path):
    from analyst_spark.streaming.joins import stream_to_partitioned_lake

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    q = stream_to_partitioned_lake(
        stream, out, ckpt, partition_by=["event_type"]
    ).start()
    assert q.awaitTermination(120)
    back = spark.read.parquet(out)
    assert back.count() == 6  # 5 events + flush
    # both micro-batches landed under distinct batch dirs
    import glob as _g

    assert len(_g.glob(out + "/_batch_id=*")) == 2


def test_streaming_quality_filter_equals_batch(spark):
    """availableNow streaming intake gate == batch Gopher battery."""
    from pyspark.sql import functions as F

    from analyst_spark.plans.pipeline_plans import docs_gopher_filter
    from analyst_spark.plans.streaming_plans import streaming_quality_filter
    from analyst_spark.tables import load_tables

    sf = "/root/testdata/sf0.001"
    got = {r.lang: (r.n_docs, r.n_keep, r.kept_tokens)
           for r in streaming_quality_filter(spark, sf).collect()}
    batch = docs_gopher_filter(spark, sf)
    docs = load_tables(spark, sf)["documents"].select("doc_id", "lang")
    want = {
        r.lang: (r.n_docs, r.n_keep, r.kept_tokens)
        for r in batch.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).cast("long").alias("n_keep"),
            F.sum(F.when(F.col("keep"), F.col("n_words")).otherwise(0))
            .cast("long").alias("kept_tokens"),
        )
        .collect()
    }
    assert got == want and sum(v[1] for v in got.values()) > 0


def test_streaming_classifier_gate_equals_batch(spark):
    """availableNow foreachBatch intake scored by the FROZEN
    classifier == the batch frozen-margin computation (deterministic
    integer margins make them bit-equal)."""
    from pyspark.sql import functions as F

    from analyst_spark.functions.classifier import frozen_quality_margins
    from analyst_spark.plans.pipeline_plans import _FUNNEL_QC_MARGIN_MIN
    from analyst_spark.plans.streaming_plans import streaming_classifier_gate
    from analyst_spark.tables import load_tables

    sf = "/root/testdata/sf0.001"
    got = {r.lang: (r.n_docs, r.n_keep)
           for r in streaming_classifier_gate(spark, sf).collect()}
    docs = load_tables(spark, sf)["documents"]
    want = {
        r.lang: (r.n_docs, r.n_keep)
        for r in docs.select("doc_id", "lang")
        .join(frozen_quality_margins(docs), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                (F.col("margin") >= F.lit(_FUNNEL_QC_MARGIN_MIN)).cast("long")
            ).cast("long").alias("n_keep"),
        )
        .collect()
    }
    assert got == want
    assert sum(n for n, _ in got.values()) > 0
    # the gate must actually drop something at this threshold
    assert any(k < n for n, k in got.values())


def test_streaming_incremental_perceptual_equals_batch(spark):
    """The streaming multimodal probe must be ROW-IDENTICAL to the
    batch entry — stateless signatures + stream-static join leave no
    micro-batch-boundary dependence (r11; same device and contract as
    streaming_incremental_neardup)."""
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    batch = QUERIES["multimodal_incremental_perceptual"](spark, sf)
    b = {tuple(r) for r in batch.collect()}
    release_cached(batch)
    s = {
        tuple(r)
        for r in QUERIES["streaming_incremental_perceptual"](
            spark, sf
        ).collect()
    }
    assert b == s and b


def test_streaming_incremental_embedding_equals_batch(spark):
    """The streaming embedding probe must be ROW-IDENTICAL to the
    batch entry (r12 — completes the incremental trio's streaming
    twins): stateless Arrow signatures + stream-static band join +
    first-matching-band dedup leave no micro-batch-boundary
    dependence."""
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    batch = QUERIES["dedup_incremental_embedding"](spark, sf)
    b = {tuple(r) for r in batch.collect()}
    release_cached(batch)
    s = {
        tuple(r)
        for r in QUERIES["streaming_incremental_embedding"](
            spark, sf
        ).collect()
    }
    assert b == s and b
