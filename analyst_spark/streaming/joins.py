"""Stream-stream joins with watermark-bounded buffers.

The attribution pattern: a stream of ``view`` events joined to a
stream of ``click`` events for the same user, where the click must
land within a bounded interval after the view. Both sides carry a
watermark and the join predicate carries the time bound — that pair
is what lets Spark EXPIRE buffered rows: without them a
stream-stream join must keep every row forever.

At 100 TB/day scale this is the canonical two-Kafka-topic join; state
per executor stays O(events inside the interval window), enforced by
the watermarks, and the shuffle partitions both streams by user_id so
matching rows co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_click_attribution_stream(
    views: DataFrame,
    clicks: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner join: each click attributed to a preceding view by the
    same user within ``max_gap``. Event-time constraints on BOTH
    sides + both watermarks → bounded join state."""
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    return v.join(c, cond, "inner").select(
        F.col("v_user").alias("user_id"), "view_id", "click_id", "view_ts", "click_ts"
    )


def stream_to_partitioned_lake(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str],
):
    """foreachBatch sink into the partitioned lake layout
    (sinks/files.py): per micro-batch, one idempotent append keyed by
    batch_id. foreachBatch is the exactly-once bridge — the batch
    writer runs inside the streaming commit protocol, and replays of
    a failed batch overwrite the same batch_id partition rather than
    duplicating rows."""
    from analyst_spark.sinks.files import write_partitioned

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        # dynamic partition overwrite: a replayed batch rewrites ONLY
        # its own _batch_id=<n> directory — idempotent, no dedup scan
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            write_partitioned(
                batch_df.withColumn("_batch_id", F.lit(batch_id)),
                path,
                partition_by=["_batch_id", *partition_by],
                mode="overwrite",
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
