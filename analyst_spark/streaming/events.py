"""Structured Streaming over the events table.

The reference has no true streaming (SURVEY §1.3 — its "streams" are
bounded channel pipelines; continuity came from the cron scheduler
re-running jobs). This module is the beyond-parity piece: the SAME
logical plans as plans/events_plans.py, expressed against readStream
so they run continuously with watermarked state.

Batch/stream unification is the point: ``hourly_rollup_stream`` is
the streaming twin of ``events_hourly_rollup`` (same groupBy) and the
oracle-checked batch results certify the aggregation logic; streaming
tests certify watermark/output-mode mechanics with availableNow
triggers on file sources.

At scale: the file source becomes Kafka; watermark bounds state so a
1000-executor job's aggregation state stays O(windows in flight), not
O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of event JSON/parquet drops. The schema is
    declared (streams cannot infer), matching the batch table."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def hourly_rollup_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1h windows with late-data tolerance = watermark.
    State per (window, event_type) only — watermark expires old
    windows so state is bounded. The mean accumulates integer cents
    (value is cents-exact) and rounds to 4dp in INTEGER arithmetic —
    state-merge order can't move the result, and cents-valued data
    lands on exact decimal halves where engines' float round()
    disagree (caught by the r7 sf0.1 gate)."""
    from analyst_spark.tables import cents_of

    cents = cents_of("value")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(cents).alias("__nv"),  # valid measurements
            # decimal group sum: see events_plans.events_hourly_rollup
            # (int64 would wrap on extreme in-domain cents; DuckDB
            # promotes to HUGEINT - silent divergence otherwise)
            F.sum(cents.cast("decimal(28,0)")).alias("__sc"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            (
                F.expr(
                    "CASE WHEN __nv = 0 THEN NULL "
                    "WHEN __sc >= 0 THEN (200*__sc + __nv) DIV (2*__nv) "
                    "ELSE -((-200*__sc + __nv) DIV (2*__nv)) END"
                )
                / F.lit(10000.0)
            ).alias("avg_value"),
        )
    )


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Custom stateful operator: session windows via the built-in
    session_window (gap-based), the declarative form of the
    applyInPandasWithState pattern — state handled by Spark, merges
    across batches, expired by watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("sw"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> "StreamingQuery":  # noqa: F821
    """Drive a streaming plan with the availableNow trigger (process
    everything pending, then stop) into an in-memory sink — the test
    harness pattern; swap for kafka/delta sinks in production."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
