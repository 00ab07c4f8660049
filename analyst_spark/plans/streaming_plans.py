"""Oracle-checked Structured Streaming gate entry.

Runs the REAL streaming path — file source → watermarked windowed
aggregation → memory sink, availableNow trigger — over the events
table (staged to JSON line files so readStream has a file stream to
consume), then returns the sink contents as a batch DataFrame.

In ``complete`` output mode every window is emitted regardless of the
watermark, so the result must equal the batch hourly rollup — which
gives streaming execution itself a DuckDB oracle instead of the usual
rows-only waiver. (The watermark/append close-out mechanics are
covered by tests/test_streaming.py.)
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from analyst_spark.streaming.events import (
    hourly_rollup_stream,
    read_events_stream,
    run_to_memory_sink,
)
from analyst_spark.tables import load_tables

_SINK = "streaming_hourly_rollup_gate"

# State-contract audit trail (VERDICT r12 #2). Every streaming entry
# funnels through _await_or_raise, which appends the finished query's
# (name, stateOperators) here. The r11 unbounded stream-stream join
# shipped a full round of green gates precisely because bounded gate
# runs never notice unbounded state — tests/test_streaming_state.py
# replays every catalog streaming entry against this trail and asserts
# the set of STATEFUL operators equals the entry's declared contract
# (most entries: none; aggregation entries: exactly their one
# aggregation). A reintroduced symmetric hash join / accidental
# dropDuplicates shows up as an undeclared operator at test time.
STATE_AUDIT: list[tuple[str | None, list[dict]]] = []


def _await_or_raise(q, timeout: int = 600) -> None:
    """awaitTermination returns FALSE on timeout — silently
    aggregating whatever partial micro-batches landed would read as a
    data bug rather than a timeout (r7 advice). Stop the query and
    raise instead."""
    if not q.awaitTermination(timeout):
        try:
            q.stop()
        finally:
            raise TimeoutError(
                f"streaming query {q.name or q.id} did not finish its "
                f"availableNow run within {timeout}s"
            )
    prog = q.lastProgress
    if prog is not None:
        STATE_AUDIT.append((q.name, prog.get("stateOperators") or []))


def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    tmp = tempfile.mkdtemp(prefix="asp_stream_events_")
    try:
        (
            ev.select("event_id", "ts", "user_id", "event_type", "value", "props")
            .coalesce(8)
            .write.mode("overwrite")
            .json(tmp)
        )
        q = run_to_memory_sink(
            hourly_rollup_stream(read_events_stream(spark, tmp)),
            _SINK,
            output_mode="complete",
        )
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(_SINK)


STREAMING_HOURLY_ORACLE = """
SELECT hour, event_type, n_events,
       (CASE WHEN nv = 0 THEN NULL
             WHEN sc >= 0 THEN (200*sc + nv) // (2*nv)
             ELSE -((-200*sc + nv) // (2*nv)) END) / 10000.0
           AS avg_value
FROM (
    SELECT date_trunc('hour', ts)  AS hour,
           event_type,
           count(*)                AS n_events,
           count(cents)            AS nv,
           CAST(sum(cents) AS BIGINT) AS sc
    FROM (SELECT ts, event_type, CASE WHEN abs(value) <= 9e13 THEN CAST(round(value * 100) AS BIGINT) END AS cents FROM events)
    GROUP BY 1, 2
)
"""


_SESS_SINK = "streaming_sessionize_gate"
_DEDUP_SINK = "streaming_dedup_gate"


def _stage_events_parquet(spark: SparkSession, sf_dir: str, df=None) -> str:
    """Stage events as parquet files for readStream. Parquet, not
    JSON: the JSON writer's default timestampFormat truncates to
    milliseconds, which is invisible to hour-window rollups but
    corrupts session boundaries and any µs-exact oracle."""
    ev = df if df is not None else load_tables(spark, sf_dir)["events"]
    tmp = tempfile.mkdtemp(prefix="asp_stream_stage_")
    (
        ev.select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(8)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    return tmp


def _read_events_stream_parquet(spark: SparkSession, path: str) -> DataFrame:
    from analyst_spark.streaming.events import EVENT_SCHEMA

    return spark.readStream.schema(EVENT_SCHEMA).parquet(path)


def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows on the real streaming path: file source →
    ``session_window`` (30 min gap) → memory sink in ``complete``
    mode, so every merged session is emitted and the result must
    equal the batch gaps-and-islands computation — a full DuckDB
    oracle for Spark's streaming session-merge state machine.

    Boundary semantics: ``session_window`` extends a session to
    [first, last + gap) with an exclusive end, so an event at exactly
    last + gap starts a NEW session — the oracle's break condition is
    therefore ``diff >= gap``, not ``>``.

    At 100 TB: state per in-flight (user, session) only; the
    watermark closes sessions whose end precedes it, so state is
    bounded by the gap + lateness horizon, not history.
    """
    from analyst_spark.streaming.events import sessionize_stream

    tmp = _stage_events_parquet(spark, sf_dir)
    try:
        q = run_to_memory_sink(
            sessionize_stream(
                _read_events_stream_parquet(spark, tmp), gap_minutes=30
            ),
            _SESS_SINK,
            output_mode="complete",
        )
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    from pyspark.sql import functions as F

    # epoch-µs integers, not timestamps: the oracle view reads the
    # parquet's TIMESTAMP(NANOS) directly while Spark's ts is the
    # ns DIV 1000 rebuild, so isoformat strings would differ in
    # sub-µs digits even for identical sessions
    return spark.table(_SESS_SINK).select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        F.col("n_events").cast("long").alias("n_events"),
    )


STREAMING_SESSIONIZE_ORACLE = """
WITH us AS (  -- µs domain first: the exact values Spark computes on
    SELECT user_id, epoch_us(ts) AS ts_us FROM events
), flagged AS (
    SELECT user_id, ts_us,
           CASE WHEN lag(ts_us) OVER w IS NULL
                  OR ts_us - lag(ts_us) OVER w >= 1800000000
                THEN 1 ELSE 0 END AS new_sess
    FROM us
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
), sessions AS (
    SELECT user_id, ts_us,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                               ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id,
       CAST(min(ts_us) AS BIGINT) AS session_start_us,
       CAST(max(ts_us) + 1800000000 AS BIGINT) AS session_end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous exact dedup on the real streaming path: the event
    stream is polluted with replayed copies (every event_id % 101 ==
    0 re-sent one minute later), dropDuplicatesWithinWatermark
    collapses them in the state store, and the surviving rows are
    rolled up per event_type. The rollup of the deduped stream must
    equal the rollup of the CLEAN batch table — which copy survives
    is racy, but every aggregated measure (count, distinct users,
    id checksum) is copy-invariant, so the oracle is exact.

    At 100 TB: state is O(keys within the watermark horizon); the
    replay window a Kafka redelivery can span is exactly the
    watermark, which is the reference point for sizing it.
    """
    from pyspark.sql import functions as F

    from analyst_spark.streaming.dedup import dedup_stream

    ev = load_tables(spark, sf_dir)["events"]
    replayed = ev.filter(F.col("event_id") % 101 == 0).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 MINUTE")
    )
    tmp = _stage_events_parquet(spark, sf_dir, ev.unionByName(replayed))
    try:
        q = run_to_memory_sink(
            dedup_stream(_read_events_stream_parquet(spark, tmp), keys=["event_id"]),
            _DEDUP_SINK,
            output_mode="append",
        )
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return (
        spark.table(_DEDUP_SINK)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum("event_id").cast("long").alias("id_checksum"),
        )
    )


STREAMING_DEDUP_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(event_id) AS BIGINT) AS id_checksum
FROM events
GROUP BY event_type
"""


_TOTALS_SINK = "streaming_running_totals_gate"


def streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) on the real
    streaming path: per-user running counters in update mode. The
    memory sink accumulates every update-mode emission, so the entry
    reduces to each user's FINAL counter (max n_events — the counter
    is monotone), which must equal the batch per-user event count.

    Only the exact-integer counter is oracle-gated: the running value
    sum is a float accumulated in arrival order, so its low bits are
    execution-order-dependent by nature (the pytest suite bounds it
    instead).

    At 100 TB: state is one compact tuple per user, Arrow-batched;
    processing-time timeout expires inactive users so the store does
    not grow with history.
    """
    from pyspark.sql import functions as F

    from analyst_spark.streaming.stateful import running_user_totals

    tmp = _stage_events_parquet(spark, sf_dir)
    try:
        q = run_to_memory_sink(
            running_user_totals(
                _read_events_stream_parquet(spark, tmp), expire=False
            ),
            _TOTALS_SINK,
            output_mode="update",
        )
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return (
        spark.table(_TOTALS_SINK)
        .groupBy("user_id")
        .agg(F.max("n_events").cast("long").alias("n_events"))
    )


STREAMING_TOTALS_ORACLE = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
"""


_JOIN_SINK = "streaming_view_click_join_gate"


def streaming_view_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join on the real streaming path: two file
    streams (views, clicks) joined per user with a 30-minute event-time
    bound (streaming/joins.py view_click_attribution_stream).

    Inner stream-stream joins emit each match as soon as both sides
    arrive — the watermark only bounds buffered state — so with the
    availableNow trigger the append-mode sink holds exactly the batch
    interval-join result, giving the stream-stream join machinery a
    DuckDB oracle instead of a rows-only waiver.

    At 100 TB this is the two-Kafka-topic attribution join: both sides
    shuffle-partition on user_id so matches co-locate, and state per
    executor stays O(rows inside the watermark horizon).
    """
    from pyspark.sql import functions as F

    from analyst_spark.streaming.joins import view_click_attribution_stream

    tmp = _stage_events_parquet(spark, sf_dir)
    try:
        views = _read_events_stream_parquet(spark, tmp).filter(
            F.col("event_type") == "view"
        )
        clicks = _read_events_stream_parquet(spark, tmp).filter(
            F.col("event_type") == "click"
        )
        q = run_to_memory_sink(
            view_click_attribution_stream(
                views, clicks, max_gap="30 minutes", watermark="1 hour"
            ),
            _JOIN_SINK,
            output_mode="append",
        )
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(_JOIN_SINK)


STREAMING_JOIN_ORACLE = """
SELECT v.user_id,
       v.event_id AS view_id,
       c.event_id AS click_id,
       v.ts AS view_ts,
       c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts
 AND c.ts <= v.ts + INTERVAL 30 MINUTE
"""


_QF_SINK = "streaming_quality_filter_gate"


def streaming_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus intake with an inline quality gate: documents
    arrive as a file stream, the Gopher rule battery runs per
    micro-batch (stateless Catalyst expressions — literally the same
    gopher_features() the batch entry uses), and a complete-mode
    aggregation reports per-language intake totals vs survivors.

    Because the map stage is stateless and the aggregation runs in
    complete mode under availableNow, the streaming result must equal
    the batch rule battery — giving the streaming path a DuckDB
    oracle. At scale this is the data-ingest shape: filter at the
    edge of the stream, never land unfiltered text.
    """
    from pyspark.sql import functions as F

    from analyst_spark.plans.pipeline_plans import gopher_features

    docs = load_tables(spark, sf_dir)["documents"]
    tmp = tempfile.mkdtemp(prefix="asp_stream_docs_")
    try:
        docs.select("doc_id", "text", "lang", "source", "n_chars").coalesce(
            8
        ).write.mode("overwrite").json(tmp)
        stream = spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        ).json(tmp)
        feat = gopher_features(stream, extra_cols=("lang",))
        agg = feat.groupBy("lang").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).cast("long").alias("n_keep"),
            F.sum(F.when(F.col("keep"), F.col("n_words")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
        q = run_to_memory_sink(agg, _QF_SINK, output_mode="complete")
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(_QF_SINK)


STREAMING_QF_ORACLE = None  # assembled below from the batch gopher oracle


def _qf_oracle() -> str:
    from analyst_spark.plans.pipeline_plans import DOCS_GOPHER_ORACLE

    return f"""
WITH g AS (SELECT * FROM ({DOCS_GOPHER_ORACLE}))
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (g.keep) AS BIGINT) AS n_keep,
       CAST(COALESCE(sum(g.n_words) FILTER (g.keep), 0) AS BIGINT) AS kept_tokens
FROM g JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


STREAMING_QF_ORACLE = _qf_oracle()


def streaming_classifier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming intake scored by the FROZEN quality classifier — the
    CCNet model at the STREAM edge, completing the funnel-v2 story:
    weights trained offline ship as constants
    (functions/classifier_frozen.py), every arriving micro-batch is
    scored via ``foreachBatch`` running the exact batch scorer
    (frozen_quality_margins: hashed features → exact-integer margin),
    and the landed results aggregate to per-language intake/keep
    counts.

    ``foreachBatch`` (not a chained streaming agg — Spark forbids two
    aggregations in one streaming query) is the production intake
    shape: per-batch model application, append to the lake, aggregate
    downstream. The margin is deterministic integer arithmetic, so
    the streamed result equals the batch computation and the entry
    carries a full DuckDB oracle.
    """
    from pyspark.sql import functions as F

    from analyst_spark.functions.classifier import frozen_quality_margins
    from analyst_spark.plans.pipeline_plans import _FUNNEL_QC_MARGIN_MIN

    docs = load_tables(spark, sf_dir)["documents"]
    tmp = tempfile.mkdtemp(prefix="asp_stream_cls_")
    out_dir = tempfile.mkdtemp(prefix="asp_stream_cls_out_")
    try:
        docs.select("doc_id", "text", "lang").coalesce(8).write.mode(
            "overwrite"
        ).json(tmp)
        stream = spark.readStream.schema(
            "doc_id long, text string, lang string"
        ).json(tmp)

        def score_batch(batch_df, _epoch):
            scored = frozen_quality_margins(batch_df)
            (
                batch_df.select("doc_id", "lang")
                .join(scored, "doc_id")
                .select(
                    "doc_id",
                    "lang",
                    (
                        F.col("margin") >= F.lit(_FUNNEL_QC_MARGIN_MIN)
                    ).alias("keep"),
                )
                .write.mode("append")
                .parquet(out_dir)
            )

        q = (
            stream.writeStream.foreachBatch(score_batch)
            .trigger(availableNow=True)
            .start()
        )
        _await_or_raise(q)
        landed = spark.read.schema(
            "doc_id long, lang string, keep boolean"
        ).parquet(out_dir)
        # language-count report: bounded by the language set, so
        # collecting it lets the staging dir be cleaned up eagerly
        # (the memory-sink device the other streaming entries use,
        # with parquet standing in for the lake the gate appends to)
        rows = (
            landed.groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(F.col("keep").cast("long")).cast("long").alias("n_keep"),
            )
            .collect()
        )
        return spark.createDataFrame(
            rows, "lang string, n_docs long, n_keep long"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


def _cls_gate_oracle() -> str:
    from analyst_spark.functions.classifier_frozen import BIAS_NANO, N_BUCKETS
    from analyst_spark.plans.pipeline_plans import (
        _FUNNEL_QC_MARGIN_MIN,
        _qc_frozen_values,
    )

    return rf"""
WITH qtok AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
    FROM documents
),
qcnt AS (
    SELECT doc_id,
           CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % {N_BUCKETS} AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM qtok GROUP BY 1, 2
),
qtot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total FROM qcnt GROUP BY 1),
qw(bucket, wn) AS (VALUES {_qc_frozen_values()}),
qnum AS (
    SELECT c.doc_id, CAST(sum(c.cnt * qw.wn) AS BIGINT) AS numer
    FROM qcnt c JOIN qw USING (bucket) GROUP BY 1
),
qc AS (
    SELECT t.doc_id,
           COALESCE(qnum.numer, 0) / (t.total * 1e9)
             + {BIAS_NANO} / 1000000000.0 AS margin
    FROM qtot t LEFT JOIN qnum USING (doc_id)
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (qc.margin >= {_FUNNEL_QC_MARGIN_MIN}) AS BIGINT)
           AS n_keep
FROM documents d JOIN qc USING (doc_id)
GROUP BY d.lang
"""


STREAMING_CLS_GATE_ORACLE = _cls_gate_oracle()


_ANOM_SINK = "streaming_anomaly_gate_sink"


def streaming_anomaly_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming metric-anomaly gate in the train-batch/score-stream
    deployment shape: per-type moment stats are computed ONCE on the
    batch history (the exact factored stats the batch
    events_anomaly_zscore entry uses — analytics_plans.anomaly_stats),
    broadcast into the stream, and every arriving micro-batch is
    scored |z| > 3 statelessly; a complete-mode aggregation reports
    per-type arrivals vs anomalies.

    Because scoring is stateless against FROZEN stats and the
    aggregation runs complete-mode under availableNow, the streaming
    result must equal the batch computation — so this streaming path
    carries a full DuckDB hash oracle, like streaming_quality_filter.
    At 100 TB this is the standard monitoring shape: stats refresh on
    a batch cadence, the stream pays one broadcast join per event.
    """
    from pyspark.sql import functions as F

    from analyst_spark.plans.analytics_plans import (
        _ZSCORE_THRESHOLD,
        anomaly_stats,
        events_with_cents,
        zscore_expr,
    )

    ev = load_tables(spark, sf_dir)["events"]
    stats = anomaly_stats(events_with_cents(ev))
    tmp = tempfile.mkdtemp(prefix="asp_stream_anom_")
    try:
        ev.select("event_id", "ts", "user_id", "event_type", "value").coalesce(
            8
        ).write.mode("overwrite").json(tmp)
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double"
        ).json(tmp)
        scored = events_with_cents(stream).join(
            F.broadcast(stats), "event_type", "left"
        )
        flag = F.when(
            F.col("n").isNotNull()
            & (F.abs(zscore_expr()) > F.lit(_ZSCORE_THRESHOLD)),
            F.lit(1),
        ).otherwise(F.lit(0))
        agg = scored.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(flag).cast("long").alias("n_anomalies"),
        )
        q = run_to_memory_sink(agg, _ANOM_SINK, output_mode="complete")
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(_ANOM_SINK)


STREAMING_ANOMALY_ORACLE = """
WITH c AS (
    SELECT event_id, event_type, value,
           CASE WHEN abs(value) <= 9e13 THEN CAST(round(value * 100) AS BIGINT) END AS cents
    FROM events
), st AS (
    SELECT event_type, count(cents) AS n,
           CAST(sum(cents) AS BIGINT) AS s,
           CAST(sum(cents * cents) AS BIGINT) AS ss
    FROM c GROUP BY event_type
    HAVING min(cents) <> max(cents)  -- exact guard, overflow-free
)
SELECT c.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (
           st.event_type IS NOT NULL
           AND abs((c.cents - CAST(st.s AS DOUBLE) / st.n)
               / sqrt(CAST(st.ss AS DOUBLE) / st.n
                      - (CAST(st.s AS DOUBLE) / st.n)
                        * (CAST(st.s AS DOUBLE) / st.n))) > 3.0
       ) AS BIGINT) AS n_anomalies
FROM c LEFT JOIN st USING (event_type)
GROUP BY c.event_type
"""


_MAD_SINK = "streaming_anomaly_mad_sink"


def streaming_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) twin of streaming_anomaly_gate: per-type
    doubled-median stats (analytics_plans.mad_stats — exact BIGINTs)
    are frozen from the batch history, broadcast into the stream, and
    each arriving event is flagged by the all-integer comparison
    1349*dev2 > 3500*mad4. Stateless scoring against frozen integer
    stats + complete-mode integer counts ⇒ stream ≡ batch exactly, so
    the entry carries a full DuckDB hash oracle. Zero-MAD and
    stats-missing types count events, never anomalies."""
    from pyspark.sql import functions as F

    from analyst_spark.plans.analytics_plans import (
        events_with_cents,
        mad_flag_expr,
        mad_stats,
    )

    ev = load_tables(spark, sf_dir)["events"]
    stats = mad_stats(events_with_cents(ev))
    tmp = tempfile.mkdtemp(prefix="asp_stream_mad_")
    try:
        ev.select("event_id", "ts", "user_id", "event_type", "value").coalesce(
            8
        ).write.mode("overwrite").json(tmp)
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double"
        ).json(tmp)
        scored = (
            events_with_cents(stream)
            .join(F.broadcast(stats), "event_type", "left")
            .withColumn("dev2", F.abs(2 * F.col("cents") - F.col("med2")))
        )
        flag = F.when(mad_flag_expr(), F.lit(1)).otherwise(F.lit(0))
        agg = scored.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(flag).cast("long").alias("n_anomalies"),
        )
        q = run_to_memory_sink(agg, _MAD_SINK, output_mode="complete")
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(_MAD_SINK)


STREAMING_ANOMALY_MAD_ORACLE = """
WITH c AS (
    SELECT event_id, event_type, value,
           CASE WHEN abs(value) <= 9e13 THEN CAST(round(value * 100) AS BIGINT) END AS cents
    FROM events
), med AS (
    SELECT event_type,
           CAST(round(2 * quantile_cont(cents, 0.5)) AS BIGINT) AS med2
    FROM c WHERE cents IS NOT NULL GROUP BY 1
), mad AS (
    SELECT c.event_type,
           CAST(round(2 * quantile_cont(abs(2*c.cents - med2), 0.5)) AS BIGINT) AS mad4
    FROM c JOIN med USING (event_type) WHERE c.cents IS NOT NULL
    GROUP BY 1
), st AS (
    SELECT med.event_type, med2, mad4 FROM med JOIN mad USING (event_type)
)
SELECT c.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (
           st.event_type IS NOT NULL AND c.cents IS NOT NULL
           AND mad4 > 0
           AND CAST(1349 AS HUGEINT) * abs(2*c.cents - med2)
               > 3500 * CAST(mad4 AS HUGEINT)
       ) AS BIGINT) AS n_anomalies
FROM c LEFT JOIN st USING (event_type)
GROUP BY c.event_type
"""


_HLL_SINK = "streaming_distinct_hll_gate"


def streaming_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed approximate-distinct on the real streaming path:
    file source → 1 h watermark → hourly window × event_type →
    ``approx_count_distinct`` (HLL++, rsd 1 %) → memory sink.

    This is the streaming half of events_distinct_users_hll, and the
    pair demonstrates batch/stream sketch unification: HLL register
    merge is a per-register max — associative, commutative,
    order-independent — so the streaming run over arbitrary
    micro-batch boundaries produces BIT-IDENTICAL estimates to the
    one-pass batch aggregation. tests/test_advice_r8.py pins that
    equality exactly; tools/verify_local.py bands every group against
    DuckDB's exact distinct count (5·rsd).

    At 100 TB: exact streaming distinct needs per-key state
    proportional to the number of distinct users inside the watermark
    horizon — unbounded. The sketch caps state at ~kB per open
    (window, type) group, and the same sketches roll up across hours
    by merging, never recounting. ``hour`` is emitted as epoch-µs so
    cross-engine checks never touch timezone rendering.
    """
    from pyspark.sql import functions as F

    from analyst_spark.plans.events_plans import HLL_RSD

    tmp = _stage_events_parquet(spark, sf_dir)
    try:
        src = _read_events_stream_parquet(spark, tmp)
        agg = (
            src.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.approx_count_distinct("user_id", rsd=HLL_RSD).alias(
                    "n_users_approx"
                ),
                F.count(F.lit(1)).alias("n_events"),
            )
        )
        q = run_to_memory_sink(agg, _HLL_SINK, output_mode="complete")
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(_HLL_SINK).select(
        F.unix_micros("w.start").alias("hour_us"),
        "event_type",
        "n_users_approx",
        "n_events",
    )


_CMS_HH_SINK = "streaming_hh_exact_gate"
_CMS_BLOB_SINK = "streaming_hh_cms_gate"


def streaming_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters: the CMS half of batch/stream sketch
    unification (the pair of text_heavy_hitters_cms, the way
    streaming_distinct_users_hll pairs events_distinct_users_hll).

    Documents arrive as a file stream; two availableNow queries run
    over it — an exact complete-mode token count (the oracle-able
    head) and one global ``count_min_sketch`` aggregation whose
    state IS the fixed-size sketch table. CMS merge is element-wise
    counter ADDITION — associative, commutative — so the streaming
    blob is BIT-IDENTICAL to the batch aggregation's regardless of
    micro-batch boundaries (pinned exactly in tests/test_advice_r8.py
    alongside the HLL pin). The returned frame has the batch entry's
    schema and passes the same verify_local band
    (cnt ≤ est ≤ cnt + 3·eps·N).

    At 100 TB: exact streaming token counts hold one state row per
    distinct token inside the horizon — unbounded vocabulary,
    unbounded state. The sketch caps state at the ~1.1 MB table no
    matter how many tokens stream through, and sketches from
    separate streams/hours roll up by addition without recounting.
    """
    from pyspark.sql import functions as F

    from analyst_spark.plans.pipeline_plans import (
        _CMS_CONF,
        _CMS_EPS,
        _CMS_SEED,
        _HH_TOP_K,
        hh_head_frame,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    tmp = tempfile.mkdtemp(prefix="asp_stream_docs_")
    try:
        docs.select("doc_id", "text").coalesce(8).write.mode("overwrite").json(tmp)

        def _tokens():
            # 8 staged files / 2 per trigger = 4 real micro-batches,
            # so the blob equality below is exercised across genuine
            # state-store merges, not one degenerate batch
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", "2")
                .json(tmp)
            )
            return stream.select(
                F.explode(F.split(F.col("text"), " ")).alias("token")
            ).filter(F.col("token") != "")

        queries = []
        try:
            # anything that raises from first start through the
            # awaits — including starting q2, or an interrupt — must
            # stop every live query before the finally deletes the
            # tmp dir they stream from
            queries.append(
                run_to_memory_sink(
                    _tokens()
                    .groupBy("token")
                    .agg(F.count(F.lit(1)).cast("long").alias("cnt")),
                    _CMS_HH_SINK,
                    output_mode="complete",
                )
            )
            queries.append(
                run_to_memory_sink(
                    _tokens().agg(
                        F.count_min_sketch(
                            "token",
                            F.lit(_CMS_EPS),
                            F.lit(_CMS_CONF),
                            F.lit(_CMS_SEED),
                        ).alias("cms")
                    ),
                    _CMS_BLOB_SINK,
                    output_mode="complete",
                )
            )
            for q in queries:
                _await_or_raise(q)
        except BaseException:
            for q in queries:
                try:
                    q.stop()
                except Exception:
                    pass
            raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    head = (
        spark.table(_CMS_HH_SINK)
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(_HH_TOP_K)
        .collect()  # bounded: _HH_TOP_K rows
    )
    return hh_head_frame(
        spark,
        head,
        # one ~1.1 MB sketch; lazily read so an empty corpus skips it
        lambda: spark.table(_CMS_BLOB_SINK).collect()[0].cms,
    )


# ----------------------------------------- streaming value histogram

_HIST_SINK = "streaming_value_histogram_sink"


def streaming_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_value_histogram in the train-batch /
    score-stream shape: the GLOBAL bin edges (1-row min/max of cents)
    are computed once on the batch history and broadcast into the
    stream; each arriving micro-batch assigns bins statelessly and a
    complete-mode (type, bin) aggregation accumulates count/min/max.

    Every aggregate is an order-free integer (count, min, max of
    cents), so the stream-built histogram is ROW-IDENTICAL to the
    batch entry across genuine micro-batch boundaries (8 staged files
    at maxFilesPerTrigger=2; pinned in tests/test_gapfill.py) and
    carries the SAME DuckDB hash oracle. At 100 TB this is the live
    data-quality monitor: edges refresh on a batch cadence, the
    stream pays one broadcast join per event, and state is bounded by
    types x bins regardless of volume.
    """
    from pyspark.sql import functions as F

    from analyst_spark.plans.events_plans import _HIST_BINS
    from analyst_spark.streaming.events import EVENT_SCHEMA
    from analyst_spark.tables import cents_of

    ev = load_tables(spark, sf_dir)["events"]
    base_b = ev.select("event_type", cents_of("value").alias("c")).filter(
        F.col("c").isNotNull()
    )
    rng = base_b.agg(F.min("c").alias("mn"), F.max("c").alias("mx"))
    tmp = _stage_events_parquet(spark, sf_dir)
    try:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", "2")
            .parquet(tmp)
        )
        scored = (
            stream.select("event_type", cents_of("value").alias("c"))
            .filter(F.col("c").isNotNull())
            .join(F.broadcast(rng))
            .withColumn(
                "bin",
                F.expr(
                    f"CAST(((c - mn) * {_HIST_BINS})"
                    " DIV (mx - mn + 1) AS INT)"
                ),
            )
        )
        agg = (
            scored.groupBy("event_type", "bin")
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
        q = run_to_memory_sink(agg, _HIST_SINK, output_mode="complete")
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(_HIST_SINK)


_INEAR_SINK = "streaming_incr_neardup_gate"


def streaming_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``dedup_incremental_neardup`` — the LIVE
    ingest shape: documents arrive as a file stream (8 staged files,
    maxFilesPerTrigger=2 forcing real micro-batch boundaries), each
    micro-batch is signed PER ROW with the stateless signature form
    (functions/dedup.py neardup_signatures_stateless — no explode, no
    stateful aggregation), band buckets join STREAM-STATIC against the
    maintained history index, and candidates verify by minhash
    agreement — all stateless, append mode.

    Every per-pair value is a deterministic integer computed from one
    batch row + one static index row, so the streamed pair set is
    ROW-IDENTICAL to the batch entry regardless of micro-batch
    boundaries — the entry carries the SAME DuckDB hash oracle. At
    100 TB: the index is the broadcast-or-bucketed static side; state
    is zero (no watermark needed), so the probe sustains any ingest
    rate the signature pass can scan.
    """
    from pyspark.sql import functions as F

    from analyst_spark.functions.dedup import (
        band_buckets,
        neardup_signature_index,
        neardup_signatures_stateless,
    )
    from analyst_spark.plans.text_plans import (
        _INCR_MOD,
        _INEAR_MIN_MATCH,
        _INEAR_OFFSET,
        _INEAR_STEP,
    )
    from analyst_spark.tables import spread

    docs = spread(load_tables(spark, sf_dir)["documents"], "doc_id").select(
        "doc_id", "text"
    )
    is_new = F.col("doc_id") % _INCR_MOD == 0
    hist = docs.filter(~is_new)
    index = neardup_signature_index(hist).persist()
    index.count()  # the maintained artifact; real stats for the join
    k = 8
    toks = F.split(F.trim(F.col("text")), r"\s+")
    twins = hist.filter(F.col("doc_id") % _INEAR_STEP == 0).select(
        (F.lit(4) * (F.col("doc_id") + _INEAR_OFFSET)).alias("doc_id"),
        F.array_join(
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))), " "
        ).alias("text"),
    )
    batch = docs.filter(is_new).unionByName(twins)
    tmp = tempfile.mkdtemp(prefix="asp_stream_docs_")
    try:
        batch.coalesce(8).write.mode("overwrite").parquet(tmp)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "2")
            .parquet(tmp)
        )
        ssigs = neardup_signatures_stateless(stream, num_hashes=k)
        # keep_signature=True: the stream's signature RIDES the band
        # rows instead of joining back to ssigs — that join was a
        # stream-stream join (both sides derive from the source),
        # which Spark plans as a symmetric hash join buffering
        # UNBOUNDED state with no watermark (r12 review), quietly
        # contradicting the zero-state contract this docstring
        # claims. With the signature carried, both remaining joins
        # are stream-static broadcasts and state is genuinely zero.
        sb = band_buckets(ssigs, keep_signature=True).withColumnRenamed(
            "doc_id", "id_batch"
        )
        hb = band_buckets(index, keep_signature=True).select(
            F.col("doc_id").alias("id_hist"),
            *[F.col(f"mh{i}").alias(f"__h{i}") for i in range(k)],
            "band",
            "bucket",
        )
        cand = sb.join(F.broadcast(hb), ["band", "bucket"])
        n_match = sum(
            (F.col(f"mh{i}") == F.col(f"__h{i}")).cast("int")
            for i in range(k)
        )
        # STATELESS pair dedup: a pair colliding in several bands
        # appears once per band; emit it only from its SMALLEST
        # matching band, recomputed from the two signature vectors
        # (bucket equality == band signature equality) — no
        # dropDuplicates state, exactly one row per pair.
        band_match = [
            (F.col(f"mh{2 * j}") == F.col(f"__h{2 * j}"))
            & (F.col(f"mh{2 * j + 1}") == F.col(f"__h{2 * j + 1}"))
            for j in range(4)
        ]
        first_band = F.when(band_match[0], 0)
        for j in range(1, 4):
            first_band = first_band.when(band_match[j], j)
        pairs = (
            cand.filter(F.col("band") == first_band)
            .withColumn("n_match", n_match.cast("long"))
            .filter(F.col("n_match") >= _INEAR_MIN_MATCH)
            .select("id_batch", "id_hist", "n_match")
        )
        q = run_to_memory_sink(pairs, _INEAR_SINK, output_mode="append")
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        index.unpersist()
    return spark.table(_INEAR_SINK)


_XCONTA_SINK = "streaming_conta_minhash_gate"


def streaming_contamination_minhash(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of ``contamination_minhash`` — decontamination
    AT INGEST TIME: training documents arrive as a file stream (8
    staged files, maxFilesPerTrigger=2 forcing real micro-batch
    boundaries), each micro-batch is signed per row with the
    stateless signature form, and band buckets join STREAM-STATIC
    against the benchmark's maintained signature index. This is the
    shape a production crawler wants — contaminated documents are
    flagged before they ever land in the training lake, not by a
    later batch sweep.

    The stateless pair device from streaming_incremental_neardup: a
    pair colliding in several bands is emitted only from its
    SMALLEST matching band, and n_bands is recomputed from the two
    signature vectors (bucket equality == band signature equality) —
    no dropDuplicates state, exactly one row per pair, every value a
    deterministic integer from one stream row + one static index
    row. The streamed pair set is therefore ROW-IDENTICAL to the
    batch entry regardless of micro-batch boundaries and carries the
    SAME DuckDB oracle. At 100 TB: the bench index is the broadcast
    static side (eval-suite-sized), state is zero, no watermark —
    the probe sustains whatever ingest rate the signature pass
    scans.
    """
    from pyspark.sql import functions as F

    from analyst_spark.functions.dedup import (
        band_buckets,
        neardup_signature_index,
        neardup_signatures_stateless,
    )
    from analyst_spark.plans.text_plans import (
        _BANDS,
        _ROWS_PER_BAND,
        _SHINGLE_N,
        _XCONTA_MOD,
    )
    from analyst_spark.tables import spread

    docs = spread(load_tables(spark, sf_dir)["documents"], "doc_id").select(
        "doc_id", "text"
    )
    is_bench = F.col("doc_id") % _XCONTA_MOD == 0
    index = neardup_signature_index(
        docs.filter(is_bench),
        n=_SHINGLE_N,
        bands=_BANDS,
        rows_per_band=_ROWS_PER_BAND,
    ).persist()
    index.count()  # the maintained artifact; real stats for the join
    # geometry SHARED with the batch entry and the oracle (r12 review:
    # a hardcoded k here would silently diverge on a _BANDS retune)
    k = _BANDS * _ROWS_PER_BAND
    tmp = tempfile.mkdtemp(prefix="asp_stream_conta_")
    try:
        docs.filter(~is_bench).coalesce(8).write.mode("overwrite").parquet(tmp)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "2")
            .parquet(tmp)
        )
        # n=_SHINGLE_N threaded like _BANDS/_ROWS_PER_BAND: relying on
        # the default would silently desynchronize this twin from its
        # batch entry and shared oracle on a _SHINGLE_N retune.
        ssigs = neardup_signatures_stateless(stream, n=_SHINGLE_N, num_hashes=k)
        # keep_signature=True: the stream's signature RIDES the band
        # rows, so the stream side never joins itself — a join back to
        # ssigs would be a stream-stream join buffering unbounded
        # state (r12 review), contradicting the zero-state contract.
        # Both remaining joins are stream-static broadcasts.
        sb = band_buckets(
            ssigs, bands=_BANDS, rows_per_band=_ROWS_PER_BAND,
            keep_signature=True,
        ).withColumnRenamed("doc_id", "train_id")
        hb = band_buckets(
            index, bands=_BANDS, rows_per_band=_ROWS_PER_BAND,
            keep_signature=True,
        ).select(
            F.col("doc_id").alias("bench_id"),
            *[F.col(f"mh{i}").alias(f"__h{i}") for i in range(k)],
            "band",
            "bucket",
        )
        cand = sb.join(F.broadcast(hb), ["band", "bucket"])
        band_match = []
        for b in range(_BANDS):
            m = F.lit(True)
            for r in range(_ROWS_PER_BAND):
                i = b * _ROWS_PER_BAND + r
                m = m & (F.col(f"mh{i}") == F.col(f"__h{i}"))
            band_match.append(m)
        first_band = F.when(band_match[0], 0)
        for b in range(1, _BANDS):
            first_band = first_band.when(band_match[b], b)
        n_bands = sum(m.cast("int") for m in band_match)
        pairs = (
            cand.filter(F.col("band") == first_band)
            .withColumn("n_bands", n_bands.cast("long"))
            .select("train_id", "bench_id", "n_bands")
        )
        q = run_to_memory_sink(pairs, _XCONTA_SINK, output_mode="append")
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        index.unpersist()
    return spark.table(_XCONTA_SINK)


_IPERC_SINK = "streaming_incr_perceptual_gate"


def streaming_incremental_perceptual(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of ``multimodal_incremental_perceptual`` — the
    LIVE multimodal crawl: image rows arrive as a file stream (8
    staged files, maxFilesPerTrigger=2 forcing real micro-batch
    boundaries), each micro-batch is dHash-signed per row
    (mapInPandas is stream-legal and STATELESS — same factored
    worker as the batch entry, byte-identical signatures), band
    values join STREAM-STATIC against the maintained history
    signature index, and candidates verify with the 4 xor+bit_count
    expressions.

    Stateless pair dedup (the streaming_incremental_neardup device):
    a pair colliding in several bands would appear once per band, so
    each pair is emitted only from its SMALLEST matching band —
    recomputed from the two signature vectors, no dropDuplicates
    state. Every emitted value is a deterministic integer from one
    stream row + one static index row, so the streamed pair set is
    ROW-IDENTICAL to the batch entry regardless of micro-batch
    boundaries — the entry carries the SAME DuckDB oracle. At
    100 TB: index broadcast-or-bucketed static side, zero state, no
    watermark; the probe sustains whatever rate the signature pass
    scans."""
    from pyspark.sql import functions as F

    from analyst_spark.functions.multimodal import (
        _dhash_worker,
        DHASH_SCHEMA,
        hamming_expr,
        image_dhash_bands,
        signature_bands,
    )
    from analyst_spark.plans.multimodal_plans import (
        _ipd_corpus,
        _IPD_MAX_DIST,
    )

    # ONE corpus construction shared with the batch entry — both
    # register against the same oracle (r11 review)
    hist, batch = _ipd_corpus(spark, sf_dir)
    batch = batch.select("doc_id", "image")
    index = image_dhash_bands(hist).persist()
    index.count()  # the maintained artifact; real stats for the join
    tmp = tempfile.mkdtemp(prefix="asp_stream_imgs_")
    try:
        batch.coalesce(8).write.mode("overwrite").parquet(tmp)
        stream = (
            spark.readStream.schema("doc_id long, image binary")
            .option("maxFilesPerTrigger", "2")
            .parquet(tmp)
        )
        ssigs = stream.mapInPandas(
            _dhash_worker("image", "doc_id"), schema=DHASH_SCHEMA
        )
        # keep_signature: the stream's four bands RIDE the exploded
        # band rows. The previous shape joined the candidate rows
        # back to ssigs — a stream-stream join Spark plans as a
        # symmetric hash join buffering UNBOUNDED state with no
        # watermark (the r12 minhash-twin bug class; this third
        # member was caught by the r13 state-contract fence,
        # tests/test_streaming_state.py: symmetricHashJoin holding
        # 94k rows on the sf0.001 gate corpus alone). With both
        # signatures carried, the single remaining join is
        # stream-static broadcast and state is genuinely zero.
        sb = signature_bands(
            ssigs, "id_batch", keep_signature=True, sig_prefix="__a"
        )
        hb = signature_bands(
            index, "id_hist", keep_signature=True, sig_prefix="__b"
        )
        hamming = hamming_expr()
        band_match = [
            F.col(f"__a{k}") == F.col(f"__b{k}") for k in range(4)
        ]
        first_band = F.when(band_match[0], 0)
        for k in range(1, 4):
            first_band = first_band.when(band_match[k], k)
        pairs = (
            sb.join(F.broadcast(hb), ["band", "val"])
            .filter(F.col("band") == first_band)
            .withColumn("hamming", hamming)
            .filter(F.col("hamming") <= _IPD_MAX_DIST)
            .select("id_batch", "id_hist", "hamming")
        )
        q = run_to_memory_sink(pairs, _IPERC_SINK, output_mode="append")
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        index.unpersist()
    return spark.table(_IPERC_SINK)


_IEMB_SINK = "streaming_incr_embedding_gate"


def streaming_incremental_embedding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of ``dedup_incremental_embedding`` — the LIVE
    vector ingest, completing the incremental trio's streaming twins
    (text: streaming_incremental_neardup, perceptual:
    streaming_incremental_perceptual): new vectors arrive as a file
    stream (8 staged files, maxFilesPerTrigger=2 forcing real
    micro-batch boundaries), each micro-batch is sign-LSH-signed per
    row (the Arrow band-signature UDF is stateless and stream-legal),
    band buckets join STREAM-STATIC against the maintained history
    signature index, and candidates verify with the exact-cosine
    Catalyst expression.

    Stateless pair dedup: a pair colliding in several bands would
    emit once per band, so each pair is emitted only from its
    SMALLEST matching band — recomputed from the two signature
    ARRAYS carried on the candidate row (zip_with equality +
    array_position), no dropDuplicates state. The stream side never
    joins itself: vectors and signature arrays ride the exploded
    band rows, and both join partners (bucket keys, history
    payloads) are broadcast static tables. Every emitted value is a
    deterministic function of one stream row + one static row, so
    the streamed pair set is ROW-IDENTICAL to the batch entry
    regardless of micro-batch boundaries — same DuckDB oracle. At
    100 TB: index broadcast-or-bucketed static side, zero state, no
    watermark."""
    from pyspark.sql import functions as F

    from analyst_spark.functions.similarity import (
        _dot,
        _norm,
        band_signature_udf,
        drop_null_vectors,
    )
    from analyst_spark.plans.text_plans import (
        _IEMB_OFFSET,
        _NEARDUP_THRESHOLD,
        _TWIN_STEP,
    )
    from analyst_spark.tables import spread

    emb = spread(load_tables(spark, sf_dir)["embeddings"], "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    is_new = F.col("vec_id") % 4 == 0
    # NULL vectors are dropped on BOTH sides exactly like the batch
    # twin's prep() (r12 review: a None element crashes the numpy
    # signature UDF; the batch entry silently drops such rows, and
    # the streamed pair set must stay row-identical to it)
    hist = drop_null_vectors(emb.filter(~is_new), "embedding")
    twins = hist.filter(F.col("vec_id") % _TWIN_STEP == 0).select(
        (F.col("vec_id") + _IEMB_OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    batch = drop_null_vectors(emb.filter(is_new), "embedding").unionByName(
        twins
    )
    sig = band_signature_udf(32, 12, 64)
    hsigs = hist.select(
        "vec_id", "embedding", sig(F.col("embedding")).alias("__sig")
    ).persist()
    tmp = tempfile.mkdtemp(prefix="asp_stream_embs_")
    try:
        # eager jobs run INSIDE the try (r12 review: a failure in the
        # materializing count would otherwise skip the finally-clause
        # unpersist and pin the signature table for the session)
        hsigs.count()  # the maintained artifact; real stats for the join
        hb = hsigs.select(
            F.col("vec_id").alias("id_hist"),
            F.posexplode("__sig").alias("band", "bucket"),
        )
        hpay = hsigs.select(
            F.col("vec_id").alias("id_hist"),
            F.col("embedding").alias("__vb"),
            F.col("__sig").alias("__sb"),
        )
        batch.coalesce(8).write.mode("overwrite").parquet(tmp)
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "2")
            .parquet(tmp)
        )
        ssig = stream.select(
            F.col("vec_id").alias("id_batch"),
            F.col("embedding").alias("__va"),
            sig(F.col("embedding")).alias("__sa"),
        )
        sb = ssig.select(
            "id_batch", "__va", "__sa",
            F.posexplode("__sa").alias("band", "bucket"),
        )
        cand = sb.join(F.broadcast(hb), ["band", "bucket"]).join(
            F.broadcast(hpay), "id_hist"
        )
        first_band = (
            F.expr("array_position(zip_with(__sa, __sb, (x, y) -> x = y), true)")
            - 1
        )
        sim = F.round(
            _dot(F.col("__va"), F.col("__vb"))
            / (_norm(F.col("__va")) * _norm(F.col("__vb"))),
            6,
        )
        pairs = (
            cand.filter(F.col("band") == first_band)
            .select("id_batch", "id_hist", sim.alias("cosine_sim"))
            .filter(F.col("cosine_sim") >= _NEARDUP_THRESHOLD)
        )
        q = run_to_memory_sink(pairs, _IEMB_SINK, output_mode="append")
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        hsigs.unpersist()
    return spark.table(_IEMB_SINK)


_XCEMB_SINK = "streaming_conta_embedding_gate"


def streaming_contamination_embedding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of ``contamination_embedding`` — SEMANTIC
    decontamination at ingest time, completing the decontamination
    family's streaming pair (text: streaming_contamination_minhash):
    training vectors arrive as a file stream, each micro-batch is
    sign-LSH-signed per row, band buckets join STREAM-STATIC against
    the benchmark's signature index, and candidates verify with the
    exact-cosine Catalyst expression. A contaminated vector is
    flagged before it lands in the training lake.

    Same stateless devices as streaming_incremental_embedding
    (smallest-matching-band emission recomputed from the signature
    arrays riding the candidate row; both join partners broadcast
    static tables; NULL vectors dropped on both sides exactly like
    the batch entry's prep). Every emitted value is a deterministic
    function of one stream row + one static row, so the streamed
    pair set is ROW-IDENTICAL to the batch entry and carries the
    SAME DuckDB oracle. At 100 TB: the bench index is the
    eval-suite-sized broadcast side, state is zero, no watermark.
    """
    from pyspark.sql import functions as F

    from analyst_spark.functions.similarity import (
        _dot,
        _norm,
        band_signature_udf,
        drop_null_vectors,
    )
    from analyst_spark.plans.text_plans import (
        _NEARDUP_THRESHOLD,
        _TWIN_STEP,
        _XEMB_MOD,
        _XEMB_OFFSET,
    )
    from analyst_spark.tables import spread

    emb = spread(load_tables(spark, sf_dir)["embeddings"], "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    is_bench = F.col("vec_id") % _XEMB_MOD == 0
    bench = drop_null_vectors(emb.filter(is_bench), "embedding")
    plants = bench.filter(F.col("vec_id") % _TWIN_STEP == 0).select(
        (F.col("vec_id") + _XEMB_OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    train = drop_null_vectors(emb.filter(~is_bench), "embedding").unionByName(
        plants
    )
    sig = band_signature_udf(32, 12, 64)
    bsigs = bench.select(
        "vec_id", "embedding", sig(F.col("embedding")).alias("__sig")
    ).persist()
    tmp = tempfile.mkdtemp(prefix="asp_stream_xemb_")
    try:
        bsigs.count()  # the maintained artifact; real stats for the join
        bb = bsigs.select(
            F.col("vec_id").alias("bench_id"),
            F.posexplode("__sig").alias("band", "bucket"),
        )
        bpay = bsigs.select(
            F.col("vec_id").alias("bench_id"),
            F.col("embedding").alias("__vb"),
            F.col("__sig").alias("__sb"),
        )
        train.coalesce(8).write.mode("overwrite").parquet(tmp)
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "2")
            .parquet(tmp)
        )
        ssig = stream.select(
            F.col("vec_id").alias("train_id"),
            F.col("embedding").alias("__va"),
            sig(F.col("embedding")).alias("__sa"),
        )
        sb = ssig.select(
            "train_id", "__va", "__sa",
            F.posexplode("__sa").alias("band", "bucket"),
        )
        cand = sb.join(F.broadcast(bb), ["band", "bucket"]).join(
            F.broadcast(bpay), "bench_id"
        )
        first_band = (
            F.expr("array_position(zip_with(__sa, __sb, (x, y) -> x = y), true)")
            - 1
        )
        sim = F.round(
            _dot(F.col("__va"), F.col("__vb"))
            / (_norm(F.col("__va")) * _norm(F.col("__vb"))),
            6,
        )
        pairs = (
            cand.filter(F.col("band") == first_band)
            .select("train_id", "bench_id", sim.alias("cosine_sim"))
            .filter(F.col("cosine_sim") >= _NEARDUP_THRESHOLD)
        )
        q = run_to_memory_sink(pairs, _XCEMB_SINK, output_mode="append")
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        bsigs.unpersist()
    return spark.table(_XCEMB_SINK)


_XDELTA_SINK = "streaming_conta_delta_gate"


def streaming_contamination_delta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of ``contamination_delta`` — the LIVE intake
    shape of the eval-suite-update lifecycle: the delta gram set
    (v2-only benchmark docs' distinct 8-grams minus v1's) is the
    maintained, eval-suite-delta-sized artifact; training documents
    arrive as a file stream (8 staged files, maxFilesPerTrigger=2
    forcing real micro-batch boundaries) and each row is scored per
    micro-batch by an Arrow-batched pandas pass against the
    BROADCAST delta set — occurrence counts, not a streaming
    aggregation, so the plan holds ZERO state (declared in
    tests/test_streaming_state.py) and needs no watermark.

    Gram extraction happens INSIDE the pandas scorer (split + join,
    linear in tokens), not as a JVM array expression: the r14
    pathological sweep measured the nested
    ``transform(_ngrams(...), xxhash64)`` shape at O(tokens²) when
    it is NOT materialized through a persisted cache (228 s for ONE
    60k-token document vs 2 s persisted) — the batch twin is linear
    only because of its ``toks.persist()``, and a stream cannot
    persist. String membership against the delta set gives the same
    counts as hash membership, so no hashing is needed at all.

    Each emitted value is a deterministic integer from one stream row
    + the frozen delta set, so the streamed result is ROW-IDENTICAL
    to the batch entry regardless of micro-batch boundaries — the
    entry carries the SAME DuckDB oracle. At 100 TB: the delta set is
    small by definition (a suite UPDATE); ship it as a broadcast
    variable and the intake sustains whatever rate the gram pass
    scans. The driver round-trip here is bounded by that same
    definition (delta-sized, never corpus-sized).
    """
    from pyspark.sql import functions as F

    from analyst_spark.plans.pipeline_plans import (
        _BENCH_MOD,
        _BENCH_MOD2,
        _NGRAM_N,
        _ngrams,
    )
    from analyst_spark.tables import spread

    docs = spread(load_tables(spark, sf_dir)["documents"], "doc_id").select(
        "doc_id", "text"
    )

    def gram_strings(df: DataFrame) -> DataFrame:
        # raw gram strings, split materialized into a column first;
        # explode of the un-hashed _ngrams array is the measured
        # LINEAR shape (0.5 s at 60k tokens) — no outer transform
        return df.select(
            "doc_id", F.split(F.col("text"), " ").alias("__t")
        ).select("doc_id", F.explode(_ngrams(F.col("__t"), _NGRAM_N)).alias("g"))

    is_v1 = F.col("doc_id") % _BENCH_MOD == 0
    is_new = (F.col("doc_id") % _BENCH_MOD2 == 0) & ~is_v1
    old_grams = gram_strings(docs.filter(is_v1)).select("g").distinct()
    delta = (
        gram_strings(docs.filter(is_new))
        .select("g")
        .distinct()
        .join(old_grams, "g", "left_anti")
    )
    # bounded collect: the delta is eval-suite-DELTA-sized (the
    # entry's whole premise); frozen for the stream's lifetime
    delta_set = frozenset(r.g for r in delta.collect())
    bc = spark.sparkContext.broadcast(delta_set)
    n = _NGRAM_N

    def score(batches):
        import pandas as pd

        dv = bc.value
        for pdf in batches:
            ids, ns, ms = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # same tokenization as F.split(text, " "): single-space
                # separator, no run-collapsing, empty text -> [""]
                toks = [] if text is None else text.split(" ")
                k = len(toks) - n + 1
                ids.append(int(doc_id))
                if k <= 0:
                    ns.append(0)
                    ms.append(0)
                    continue
                ns.append(k)
                # occurrence count (the batch entry's exploded-join
                # semantics), not distinct-gram count
                ms.append(
                    sum(
                        1
                        for i in range(k)
                        if " ".join(toks[i : i + n]) in dv
                    )
                )
            yield pd.DataFrame(
                {"doc_id": ids, "n_ngrams": ns, "n_matched": ms}
            )

    tmp = tempfile.mkdtemp(prefix="asp_stream_delta_")
    try:
        docs.filter(~is_v1 & ~is_new).coalesce(8).write.mode(
            "overwrite"
        ).parquet(tmp)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "2")
            .parquet(tmp)
        )
        scored = (
            stream.select("doc_id", "text")
            .mapInPandas(
                score, "doc_id long, n_ngrams long, n_matched long"
            )
            # zero-gram docs (null/short text) never reach the batch
            # entry's ratio (explode of an empty array emits no rows);
            # here every row flows through the per-row scorer, and ANSI
            # division by a zero n_ngrams would kill the stream
            .filter(F.col("n_ngrams") > 0)
            .withColumn(
                "overlap_ratio",
                F.round(F.col("n_matched") / F.col("n_ngrams"), 6),
            )
            .filter(F.col("overlap_ratio") >= 0.5)
            .select("doc_id", "n_ngrams", "n_matched", "overlap_ratio")
        )
        q = run_to_memory_sink(scored, _XDELTA_SINK, output_mode="append")
        _await_or_raise(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(_XDELTA_SINK)
