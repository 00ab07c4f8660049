"""Event-stream analytics over the ``events`` table.

Batch forms here (oracle-checkable); the same logical plans run under
Structured Streaming in :mod:`analyst_spark.streaming` with
``readStream`` + watermarks — Spark's batch/stream unification means
the groupBy/window code is shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from analyst_spark.tables import cents_of, load_tables


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup: count + mean value per (hour, type).
    date_trunc keeps the window a plain group key — one shuffle,
    map-side combined; identical plan under Structured Streaming.

    value is cents-exact, so both aggregates accumulate integer cents
    and derive the floats at the end: a double SUM's low bits depend
    on summation order, and at sf0.1 one group's avg landed exactly
    on the 4dp rounding half-boundary — flipping the hash between
    engines (caught by the r7 sf0.1 full gate). Integer sums are
    order-free; the division inputs are then bit-identical on Spark
    and the oracle."""
    ev = load_tables(spark, sf_dir)["events"]
    cents = cents_of("value")
    # the 4dp mean must round in INTEGER arithmetic: round(cents/
    # (100·n), 4) = half-away((100·cents)/n)/1e4 — engines' round()
    # disagree on exact decimal halves (sum 88959 cents over 24
    # events = 37.06625 exactly; Spark rounds the decimal string,
    # DuckDB the binary double), and with cents-valued data such
    # halves are COMMON, not edge — four flips at sf0.1
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(cents).alias("__nv"),  # valid measurements
            # decimal(38,0) group sum: per-row cents reach 9e15, so a
            # few thousand extreme in-domain rows could wrap an int64
            # sum (and 200*sum wraps ~200x sooner) under Spark's
            # non-ANSI arithmetic while DuckDB auto-promotes to
            # HUGEINT — a silent cross-engine divergence (r7 advice).
            # Decimal accumulates exactly; the DIV quotient is
            # ~100*avg_cents <= 9e17, safely back in int64.
            F.sum(cents.cast("decimal(28,0)")).alias("__sc"),
        )
        .select(
            "hour",
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
            (F.col("__sc") / F.lit(100.0)).alias("sum_value"),
        )
    )


EVENTS_HOURLY_ORACLE = """
SELECT hour, event_type, n_events,
       (CASE WHEN nv = 0 THEN NULL
             WHEN sc >= 0 THEN (200*sc + nv) // (2*nv)
             ELSE -((-200*sc + nv) // (2*nv)) END) / 10000.0
           AS avg_value,
       sc / 100.0 AS sum_value
FROM (
    SELECT date_trunc('hour', ts)  AS hour,
           event_type,
           count(*)                AS n_events,
           count(cents)            AS nv,
           CAST(sum(cents) AS HUGEINT) AS sc
    FROM (SELECT ts, event_type, CASE WHEN abs(value) <= 9e13 THEN CAST(round(value * 100) AS BIGINT) END AS cents FROM events)
    GROUP BY 1, 2
)
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


def events_sessions_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe sessionization (operators/sessionize.py, VERDICT
    r7 #3): same per-user session report as events_user_sessions, but
    computed with day-sliced windows + exact boundary merge so one
    pathological key (a billion-event bot) cannot straggle the stage
    — per-task sort state is bounded by one key's volume in one time
    slice. Gated against the SAME oracle as the plain entry: the
    chunked math must reproduce single-window sessionization
    row-for-row."""
    from analyst_spark.operators.sessionize import sessionize_chunked

    ev = load_tables(spark, sf_dir)["events"]
    return sessionize_chunked(ev, gap_s=1800, slice_s=86400)


def events_asof_view_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click, the user's latest view at or
    before it, plus the lag in whole seconds (operators/asof.py —
    union + forward-fill window, one shuffle on user_id)."""
    from analyst_spark.operators.asof import asof_join

    ev = load_tables(spark, sf_dir)["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    # one view per (user, ts): greatest event_id wins — mirrors the
    # oracle's pre-aggregation so ties can't break the value hash
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
        .withColumn("view_ts", F.col("ts"))
    )
    joined = asof_join(
        clicks, views, ts_col="ts", by_cols=["user_id"],
        value_cols=["view_id", "view_ts"],
    )
    return joined.select(
        "click_id",
        "user_id",
        F.col("view_id_asof").alias("view_id"),
        (F.unix_timestamp("ts") - F.unix_timestamp("view_ts_asof"))
        .cast("long")
        .alias("lag_s"),
    )


EVENTS_ASOF_ORACLE = """
WITH v AS (
    SELECT user_id, ts, max(event_id) AS view_id
    FROM events WHERE event_type = 'view' GROUP BY user_id, ts
), c AS (
    SELECT event_id AS click_id, user_id, ts
    FROM events WHERE event_type = 'click'
)
SELECT c.click_id, c.user_id, v.view_id,
       CAST(floor(epoch_us(c.ts) / 1000000)
            - floor(epoch_us(v.ts) / 1000000) AS BIGINT) AS lag_s
FROM c ASOF LEFT JOIN v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized range join: for each error event, how many clicks
    the same user made in the preceding 5 minutes
    (operators/range_join.py — equi-join on (user, time-bin), no
    per-key nested loop)."""
    from analyst_spark.operators.range_join import range_count_join

    ev = load_tables(spark, sf_dir)["events"]
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    return range_count_join(
        errors, clicks, by_cols=["user_id"], window_s=300,
        count_col="clicks_before",
    ).select("error_id", "user_id", "clicks_before")


EVENTS_RANGE_JOIN_ORACLE = """
SELECT e.event_id AS error_id, e.user_id,
       CAST(count(c.ts) AS BIGINT) AS clicks_before
FROM events e
LEFT JOIN events c
  ON c.user_id = e.user_id
 AND c.event_type = 'click'
 AND floor(epoch_us(c.ts) / 1000000) >  floor(epoch_us(e.ts) / 1000000) - 300
 AND floor(epoch_us(c.ts) / 1000000) <= floor(epoch_us(e.ts) / 1000000)
WHERE e.event_type = 'error'
GROUP BY e.event_id, e.user_id
"""


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level rollup (event_type, hour-of-day) with grouping_id —
    the hypertable-style hierarchical aggregate, free in Spark."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.withColumn("hod", F.hour("ts"))
        .rollup("event_type", "hod")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


EVENTS_ROLLUP_ORACLE = """
SELECT event_type, hour(ts) AS hod,
       CAST(GROUPING(event_type, hour(ts)) AS BIGINT) AS gid,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY ROLLUP(event_type, hour(ts))
"""


def events_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hourly rollup through the salted two-phase aggregation path
    (operators/salt.py — skew pattern for power-law keys). Measures
    are order-insensitive-exact (count/min/max) so the salted
    regrouping cannot perturb the value hash."""
    from analyst_spark.operators.salt import salted_agg

    ev = load_tables(spark, sf_dir)["events"]
    return salted_agg(
        ev.select("event_type", "value"),
        ["event_type"],
        [("count", "value", "n_events"),
         ("min", "value", "min_value"),
         ("max", "value", "max_value")],
        salt_buckets=16,
    )


EVENTS_SALTED_ORACLE = """
SELECT event_type,
       count(value) AS n_events,
       min(value)   AS min_value,
       max(value)   AS max_value
FROM events
GROUP BY event_type
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event count by event type as columns. The
    pivot value list is explicit so the output schema is static
    (required both for determinism and for production use). The
    measure is a count — integer-exact, so the hash can't sit on a
    float rounding boundary (an avg measure hit one: engine summation
    order flipped a …x5 half-way digit)."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count("value"))
        .na.fill(0, _EVENT_TYPES)
    )


EVENTS_PIVOT_ORACLE = """
SELECT user_id,
       count(CASE WHEN event_type = 'click'    THEN value END) AS click,
       count(CASE WHEN event_type = 'error'    THEN value END) AS error,
       count(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
       count(CASE WHEN event_type = 'signup'   THEN value END) AS signup,
       count(CASE WHEN event_type = 'view'     THEN value END) AS view
FROM events
GROUP BY user_id
"""


def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group (Catalyst expands to a two-phase
    aggregate). The at-scale variant is approx_count_distinct (HLL,
    mergeable, one pass) — exact form kept for the oracle gate."""
    ev = load_tables(spark, sf_dir)["events"]
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# One constant governs the sketch precision AND every 5*rsd error
# band derived from it (streaming twin, verify_local gates, pytest
# twins) — hard-coding 0.01 at a use site desynchronizes the gates
HLL_RSD = 0.01


def events_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via HyperLogLog++
    (approx_count_distinct, rsd=0.01) — the 100 TB form of
    events_distinct_users: the sketch is FIXED-SIZE and mergeable, so
    the aggregation is one map-side-combined pass with a
    sketch-per-group shuffle instead of the exact form's shuffle of
    every distinct (group, user) pair. At a billion users per type the
    exact expand ships the world; the sketch ships ~kilobytes per
    group. Correctness gate: relative error is bounded by the
    requested rsd — verify_local checks every group against DuckDB's
    exact count at a 5-sigma band (tools/verify_local.py
    _check_distinct_hll); tests/test_advice_r8.py pins the bound in
    pytest too."""
    ev = load_tables(spark, sf_dir)["events"]
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("n_users_approx"),
        F.count(F.lit(1)).alias("n_events"),
    )


EVENTS_DISTINCT_ORACLE = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       count(*) AS n_events
FROM events
GROUP BY event_type
"""


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


def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the NATIVE session_window aggregation (the
    batch form of the streaming sessionizer) — one map-side-mergeable
    aggregate, no lag/cumsum window pair. Semantics note: Spark's
    session spans [start, last+gap), so an event landing exactly at
    the gap boundary OPENS a new session (strict <), which is why the
    oracle's new-session predicate is >=, not >.

    Output per session: user, session start, event count."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


EVENTS_SESSION_WINDOW_ORACLE = """
WITH marked AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
    SELECT user_id, ts,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
)
SELECT user_id, min(ts) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess
GROUP BY user_id, sid
"""


# ------------------------------------------ gap-fill + interpolation


def events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket gap fill with LOCF and linear interpolation — the
    TimescaleDB ``time_bucket_gapfill`` + ``locf()`` +
    ``interpolate()`` trio re-expressed in Spark: hourly buckets per
    event_type, a generated dense hour spine filling the missing
    buckets, carry-forward of the last known per-bucket mean, and
    exact linear interpolation between the bracketing known buckets.

    Exactness device: the interpolated series works in the hourly
    rollup's 1e-4 avg units (``avg4`` — integer, half-away-from-zero,
    bounded by the per-row cents cap so every DIV quotient fits
    int64; the cross-term (next-prev)*(h-prev_h) can reach ~1.8e20 so
    it is computed in DECIMAL(38,0) before the DIV). Bucket index is
    integer hours since epoch. Floats (``interp_value``) derive from
    the exact integers at the end. Edge buckets with no bracketing
    value on one side interpolate to NULL; LOCF is NULL before the
    first known bucket (Timescale semantics).

    Scale: one corpus-scale aggregation (map-side combined) reduces
    events to (type, hour) rows; everything after — spine generation,
    the left join, the two windows — runs on time-bounded data
    (series x hours, ~9k rows per series-year) regardless of event
    volume. The window partitions by the series key, so state per
    task is one series' hour count, never the raw event count.
    """
    ev = load_tables(spark, sf_dir)["events"].filter(F.col("ts").isNotNull())
    cents = cents_of("value")
    agg = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(cents).alias("__nv"),
            F.sum(cents.cast("decimal(28,0)")).alias("__sc"),
        )
        .withColumn(
            "avg4",
            F.expr(
                "CASE WHEN __nv = 0 THEN NULL "
                "WHEN __sc >= 0 THEN (200*__sc + __nv) DIV (2*__nv) "
                "ELSE -((-200*__sc + __nv) DIV (2*__nv)) END"
            ),
        )
        .select("event_type", "bucket", "n_events", "avg4")
    )
    spine = (
        agg.groupBy("event_type")
        .agg(F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("__mn", "__mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    full = (
        spine.join(agg, ["event_type", "bucket"], "left")
        .withColumn("n_events", F.coalesce("n_events", F.lit(0).cast("long")))
        .withColumn("hidx", F.expr("CAST(bucket AS LONG) DIV 3600"))
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_h = F.when(F.col("avg4").isNotNull(), F.col("hidx"))
    filled = (
        full.withColumn("locf4", F.last("avg4", ignorenulls=True).over(wp))
        .withColumn("__ph", F.last(known_h, ignorenulls=True).over(wp))
        .withColumn("__nc", F.first("avg4", ignorenulls=True).over(wn))
        .withColumn("__nh", F.first(known_h, ignorenulls=True).over(wn))
        .withColumn(
            "interp4",
            F.expr(
                "CASE WHEN avg4 IS NOT NULL THEN avg4 "
                "WHEN locf4 IS NULL OR __nc IS NULL THEN NULL "
                "WHEN __nc >= locf4 THEN locf4 + "
                "  (2*CAST(__nc - locf4 AS DECIMAL(38,0))*(hidx - __ph)"
                "   + (__nh - __ph)) DIV (2*(__nh - __ph)) "
                "ELSE locf4 - "
                "  (2*CAST(locf4 - __nc AS DECIMAL(38,0))*(hidx - __ph)"
                "   + (__nh - __ph)) DIV (2*(__nh - __ph)) END"
            ),
        )
    )
    return filled.select(
        "event_type",
        "bucket",
        "n_events",
        "avg4",
        "locf4",
        "interp4",
        (F.col("interp4") / F.lit(10000.0)).alias("interp_value"),
    )


_INTERP4_EXPR = (
    "CASE WHEN avg4 IS NOT NULL THEN avg4 "
    "WHEN locf4 IS NULL OR __nc IS NULL THEN NULL "
    "WHEN __nc >= locf4 THEN locf4 + "
    "  (2*CAST(__nc - locf4 AS DECIMAL(38,0))*(hidx - __ph)"
    "   + (__nh - __ph)) DIV (2*(__nh - __ph)) "
    "ELSE locf4 - "
    "  (2*CAST(locf4 - __nc AS DECIMAL(38,0))*(hidx - __ph)"
    "   + (__nh - __ph)) DIV (2*(__nh - __ph)) END"
)

GAPFILL_CHUNK_HOURS = 24 * 30  # one-month window chunks


def events_gapfill_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events_gapfill_interpolate` with SPAN-PARALLEL windows — the
    production form for span-dominated series (SCALE.md r10: the
    global per-series windows concentrate a ×100 time-axis growth
    into one task per series; this corpus has 5 series, so the
    wall-clock floor is 5 tasks regardless of cores).

    Same device as ``events_sessions_chunked``: the hour spine is
    generated per (series, chunk) and the LOCF/bracket windows
    partition by (series, chunk) — each task owns at most
    ``GAPFILL_CHUNK_HOURS`` rows — then cross-chunk state flows
    through a (series × chunks)-sized summary table: per chunk, the
    last/first KNOWN (value, hour); two tiny windows over chunk
    order give every chunk its carry-in (last known value of any
    earlier chunk) and carry-out (first known value of any later
    chunk), skipping all-gap chunks via ignorenulls; the summary
    broadcasts back onto the spine. ``coalesce(in_chunk, carried)``
    then reproduces the GLOBAL window semantics exactly — LOCF, the
    bracketing hour indices, and hence every interpolated value are
    bit-identical to the unchunked plan (same oracle; equality
    pinned across chunk sizes in tests/test_gapfill.py).

    Cost: windows now spread over series × chunks tasks (span growth
    adds TASKS, not per-task rows); the summary table is series ×
    chunks rows — trivially small at any horizon.
    """
    return _gapfill_chunked(spark, sf_dir, GAPFILL_CHUNK_HOURS)


def _gapfill_chunked(
    spark: SparkSession, sf_dir: str, chunk_hours: int
) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"].filter(F.col("ts").isNotNull())
    cents = cents_of("value")
    agg = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(cents).alias("__nv"),
            F.sum(cents.cast("decimal(28,0)")).alias("__sc"),
        )
        .withColumn(
            "avg4",
            F.expr(
                "CASE WHEN __nv = 0 THEN NULL "
                "WHEN __sc >= 0 THEN (200*__sc + __nv) DIV (2*__nv) "
                "ELSE -((-200*__sc + __nv) DIV (2*__nv)) END"
            ),
        )
        .select("event_type", "bucket", "n_events", "avg4")
        .withColumn("hidx", F.expr("CAST(bucket AS LONG) DIV 3600"))
        .withColumn("chunk", F.expr(f"hidx DIV {chunk_hours}"))
    )
    rng = agg.groupBy("event_type").agg(
        F.min("hidx").alias("__mnh"), F.max("hidx").alias("__mxh")
    )
    # spine per (series, chunk): chunk list first (bounded), then the
    # hours inside each chunk clipped to the series range — every
    # exploded array is <= chunk_hours elements
    spine = (
        rng.select(
            "event_type",
            "__mnh",
            "__mxh",
            F.explode(
                F.sequence(
                    F.expr(f"__mnh DIV {chunk_hours}"),
                    F.expr(f"__mxh DIV {chunk_hours}"),
                )
            ).alias("chunk"),
        )
        .select(
            "event_type",
            "chunk",
            F.explode(
                F.sequence(
                    F.expr(f"greatest(chunk * {chunk_hours}, __mnh)"),
                    F.expr(
                        f"least(chunk * {chunk_hours} + {chunk_hours - 1},"
                        " __mxh)"
                    ),
                )
            ).alias("hidx"),
        )
        .withColumn("bucket", F.expr("CAST(hidx * 3600 AS TIMESTAMP)"))
    )
    full = spine.join(
        agg.select("event_type", "hidx", "n_events", "avg4"),
        ["event_type", "hidx"],
        "left",
    ).withColumn("n_events", F.coalesce("n_events", F.lit(0).cast("long")))
    # in-chunk windows: state bounded by chunk_hours rows per task
    wp = (
        Window.partitionBy("event_type", "chunk")
        .orderBy("hidx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type", "chunk")
        .orderBy("hidx")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_h = F.when(F.col("avg4").isNotNull(), F.col("hidx"))
    inchunk = (
        full.withColumn("__lc", F.last("avg4", ignorenulls=True).over(wp))
        .withColumn("__lh", F.last(known_h, ignorenulls=True).over(wp))
        .withColumn("__fc", F.first("avg4", ignorenulls=True).over(wn))
        .withColumn("__fh", F.first(known_h, ignorenulls=True).over(wn))
    )
    # (series x chunks) summary of KNOWN values; windows over chunk
    # order carry state across chunks, skipping all-gap chunks
    known = agg.filter(F.col("avg4").isNotNull())
    summ = known.groupBy("event_type", "chunk").agg(
        F.max_by("avg4", "hidx").alias("__clv"),
        F.max("hidx").alias("__clh"),
        F.min_by("avg4", "hidx").alias("__cfv"),
        F.min("hidx").alias("__cfh"),
    )
    chunk_spine = rng.select(
        "event_type",
        F.explode(
            F.sequence(
                F.expr(f"__mnh DIV {chunk_hours}"),
                F.expr(f"__mxh DIV {chunk_hours}"),
            )
        ).alias("chunk"),
    )
    cwp = (
        Window.partitionBy("event_type")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cwn = (
        Window.partitionBy("event_type")
        .orderBy("chunk")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    carry = (
        chunk_spine.join(summ, ["event_type", "chunk"], "left")
        .withColumn("__pv", F.last("__clv", ignorenulls=True).over(cwp))
        .withColumn("__phh", F.last("__clh", ignorenulls=True).over(cwp))
        .withColumn("__nv", F.first("__cfv", ignorenulls=True).over(cwn))
        .withColumn("__nhh", F.first("__cfh", ignorenulls=True).over(cwn))
        .select("event_type", "chunk", "__pv", "__phh", "__nv", "__nhh")
    )
    filled = (
        inchunk.join(F.broadcast(carry), ["event_type", "chunk"])
        .withColumn("locf4", F.coalesce("__lc", "__pv"))
        .withColumn("__ph", F.coalesce("__lh", "__phh"))
        .withColumn("__nc", F.coalesce("__fc", "__nv"))
        .withColumn("__nh", F.coalesce("__fh", "__nhh"))
        .withColumn("interp4", F.expr(_INTERP4_EXPR))
    )
    return filled.select(
        "event_type",
        "bucket",
        "n_events",
        "avg4",
        "locf4",
        "interp4",
        (F.col("interp4") / F.lit(10000.0)).alias("interp_value"),
    )


GAPFILL_ROUTE_SPAN_HOURS = 4 * GAPFILL_CHUNK_HOURS  # 4 months


def events_gapfill_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-routed gapfill (VERDICT r10 #3): pick the global or the
    span-parallel chunked form from the corpus's TIME SPAN, the way
    ``dedup_neardup_routed`` picks prefix-vs-LSH from df skew and
    ``events_sessions_chunked`` escalates on ``hot_threshold``.

    The probe is two scalars — min/max event hour, one
    map-side-combined aggregate, a 1-row driver round trip (bounded).
    Span <= GAPFILL_ROUTE_SPAN_HOURS (2,880 h = 4 × the chunk): the
    global per-series windows hold at most that many rows of state
    per task and chunking would only add its summary join; beyond
    that the windows concentrate span growth into one task per
    series (measured 476× at ×100 span on 5 series, SCALE.md r10)
    and the chunked form wins (56× there, output bit-identical).
    Both forms carry the SAME oracle hash, so the router can never
    change the answer — only the plan; the decision is reported on
    the result as ``result._asp_routing``. (A ``\"\"\".format()``
    variant of this docstring was an expression, not a docstring —
    r11 review finding.)
    """
    return _gapfill_routed(spark, sf_dir, GAPFILL_ROUTE_SPAN_HOURS)


def _gapfill_routed(
    spark: SparkSession, sf_dir: str, span_threshold_hours: int
) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"].filter(F.col("ts").isNotNull())
    bounds = ev.agg(
        F.expr("CAST(min(date_trunc('hour', ts)) AS LONG) DIV 3600").alias(
            "mnh"
        ),
        F.expr("CAST(max(date_trunc('hour', ts)) AS LONG) DIV 3600").alias(
            "mxh"
        ),
    ).collect()[0]  # bounded: 1 row, 2 scalars
    span_hours = (
        0 if bounds.mnh is None else int(bounds.mxh - bounds.mnh) + 1
    )
    chunked = span_hours > span_threshold_hours
    out = (
        _gapfill_chunked(spark, sf_dir, GAPFILL_CHUNK_HOURS)
        if chunked
        else events_gapfill_interpolate(spark, sf_dir)
    )
    out._asp_routing = {  # type: ignore[attr-defined]
        "form": "chunked" if chunked else "global",
        "span_hours": span_hours,
        "threshold_hours": span_threshold_hours,
    }
    return out


EVENTS_GAPFILL_ORACLE = """
WITH e AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket,
           CASE WHEN abs(value) <= 9e13
                THEN CAST(round(value*100) AS BIGINT) END AS cents
    FROM events WHERE ts IS NOT NULL
), agg AS (
    SELECT event_type, bucket, count(*) AS n_events,
           count(cents) AS nv, CAST(sum(cents) AS HUGEINT) AS sc
    FROM e GROUP BY 1, 2
), a4 AS (
    SELECT event_type, bucket, n_events,
           CASE WHEN nv = 0 THEN NULL
                WHEN sc >= 0 THEN (200*sc + nv) // (2*nv)
                ELSE -((-200*sc + nv) // (2*nv)) END AS avg4
    FROM agg
), rng AS (
    SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
    FROM a4 GROUP BY 1
), spine AS (
    SELECT event_type,
           unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
    FROM rng
), f AS (
    SELECT s.event_type, s.bucket,
           coalesce(a.n_events, 0) AS n_events, a.avg4,
           CAST(epoch(s.bucket) AS BIGINT) // 3600 AS hidx
    FROM spine s
    LEFT JOIN a4 a ON s.event_type = a.event_type AND s.bucket = a.bucket
), w AS (
    SELECT *,
        last_value(avg4 IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf4,
        last_value(CASE WHEN avg4 IS NOT NULL THEN hidx END IGNORE NULLS)
            OVER (PARTITION BY event_type ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        first_value(avg4 IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY bucket
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
        first_value(CASE WHEN avg4 IS NOT NULL THEN hidx END IGNORE NULLS)
            OVER (PARTITION BY event_type ORDER BY bucket
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
    FROM f
)
SELECT event_type, bucket, n_events,
       CAST(avg4 AS BIGINT) AS avg4,
       CAST(locf4 AS BIGINT) AS locf4,
       CAST(CASE WHEN avg4 IS NOT NULL THEN avg4
                 WHEN locf4 IS NULL OR nc IS NULL THEN NULL
                 WHEN nc >= locf4 THEN locf4 +
                   (2*CAST(nc - locf4 AS HUGEINT)*(hidx - ph)
                    + (nh - ph)) // (2*(nh - ph))
                 ELSE locf4 -
                   (2*CAST(locf4 - nc AS HUGEINT)*(hidx - ph)
                    + (nh - ph)) // (2*(nh - ph)) END AS BIGINT)
           AS interp4,
       CAST(CASE WHEN avg4 IS NOT NULL THEN avg4
                 WHEN locf4 IS NULL OR nc IS NULL THEN NULL
                 WHEN nc >= locf4 THEN locf4 +
                   (2*CAST(nc - locf4 AS HUGEINT)*(hidx - ph)
                    + (nh - ph)) // (2*(nh - ph))
                 ELSE locf4 -
                   (2*CAST(locf4 - nc AS HUGEINT)*(hidx - ph)
                    + (nh - ph)) // (2*(nh - ph)) END AS BIGINT)
           / 10000.0 AS interp_value
FROM w
"""


# ------------------------------------------------- value histogram

_HIST_BINS = 20


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event value per event_type over GLOBAL
    bin edges (shared edges make types comparable side by side) — the
    numeric-distribution half of data profiling. Bin assignment is
    exact integer arithmetic on cents: bin = ((c - mn) * B) DIV
    (mx - mn + 1); the reported per-bin bounds are the min/max of the
    bin's ACTUAL members (exact integers -> derived doubles), not
    computed edge labels, so every output cell is engine-exact.

    Scale: one 1-row min/max aggregate rides a broadcast; the
    histogram itself is one map-side-combined groupBy over
    (type, bin) — bounded output (types x B rows) at any corpus size.
    """
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.select("event_type", cents_of("value").alias("c")).filter(
        F.col("c").isNotNull()
    )
    rng = base.agg(F.min("c").alias("mn"), F.max("c").alias("mx"))
    return (
        base.join(F.broadcast(rng))  # 1-row scalars
        .withColumn(
            "bin",
            F.expr(f"CAST(((c - mn) * {_HIST_BINS}) DIV (mx - mn + 1) AS INT)"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c").alias("__lo"),
            F.max("c").alias("__hi"),
        )
        .select(
            "event_type",
            "bin",
            "n",
            (F.col("__lo") / 100.0).alias("bin_min"),
            (F.col("__hi") / 100.0).alias("bin_max"),
        )
    )


EVENTS_HISTOGRAM_ORACLE = f"""
WITH base AS (
    SELECT event_type,
           CASE WHEN abs(value) <= 9e13
                THEN CAST(round(value*100) AS BIGINT) END AS c
    FROM events
), nn AS (
    SELECT event_type, c FROM base WHERE c IS NOT NULL
), rng AS (
    SELECT min(c) AS mn, max(c) AS mx FROM nn
)
SELECT event_type,
       CAST(((c - mn) * {_HIST_BINS}) // (mx - mn + 1) AS INTEGER) AS bin,
       count(*) AS n,
       min(c) / 100.0 AS bin_min,
       max(c) / 100.0 AS bin_max
FROM nn CROSS JOIN rng
GROUP BY 1, 2
"""
