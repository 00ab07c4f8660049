"""Event-stream analytics over the ``events`` table.

Batch forms here (oracle-checkable); the same logical plans run under
Structured Streaming in :mod:`analyst_spark.streaming` with
``readStream`` + watermarks — Spark's batch/stream unification means
the groupBy/window code is shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from analyst_spark.tables import load_tables


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup: count + mean value per (hour, type).
    date_trunc keeps the window a plain group key — one shuffle,
    map-side combined; identical plan under Structured Streaming."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


EVENTS_HOURLY_ORACLE = """
SELECT date_trunc('hour', ts)  AS hour,
       event_type,
       count(*)                AS n_events,
       round(avg(value), 4)    AS avg_value,
       round(sum(value), 2)    AS sum_value
FROM events
GROUP BY 1, 2
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull props->k as a typed column
    (the reference's HTTPSource JSON-path analog, SURVEY §2.1 —
    distributed via get_json_object instead of driver-side gabs)."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("null_k"),
        )
    )


EVENTS_JSON_ORACLE = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 END)  AS null_k
FROM events
GROUP BY event_type
"""


def events_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a new session starts after a >30 min gap per
    user (lag + cumulative-sum pattern). Output: per-user session
    count and max session length in events."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = (
        ev.withColumn("new_sess", new_sess)
        .withColumn("session_id", F.sum("new_sess").over(w))
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )


EVENTS_SESSIONS_ORACLE = """
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR CAST(floor(epoch_us(ts) / 1000000) AS BIGINT)
                     - CAST(floor(epoch_us(lag(ts) OVER w) / 1000000) AS BIGINT) > 1800
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
    SELECT user_id,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
), per_session AS (
    SELECT user_id, session_id, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
)
SELECT user_id,
       CAST(max(session_id) AS BIGINT) AS n_sessions,
       max(n_events)                   AS max_session_events
FROM per_session GROUP BY user_id
"""
