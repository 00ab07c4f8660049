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
        q.awaitTermination(600)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(_SINK)


STREAMING_HOURLY_ORACLE = """
SELECT date_trunc('hour', ts)  AS hour,
       event_type,
       count(*)                AS n_events,
       round(avg(value), 4)    AS avg_value
FROM events
GROUP BY 1, 2
"""
