"""Streaming deduplication — exact dedup as a continuous operator.

Batch exact dedup (functions/dedup.py) is a hash-groupBy; the
streaming twin keeps a state store of seen keys instead.
``dropDuplicatesWithinWatermark`` bounds that state by the watermark:
a key is remembered only until the watermark passes its event time,
so state is O(keys per watermark window), not O(all history) — the
property that makes continuous dedup viable on an unbounded firehose.

Dedup by id (exact replays) or by content fingerprint (same payload
re-sent under a new id) — the latter is the streaming form of
``exact_dedup``'s md5-groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose key was already seen within the watermark
    horizon (first occurrence wins)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def dedup_stream_by_content(
    events: DataFrame,
    content_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Content-fingerprint variant: md5 over the concatenated payload
    columns (null-safe), so re-sent payloads dedupe even with fresh
    ids. The fingerprint column stays in the output for audit."""
    fp = F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                      for c in content_cols]
        )
    )
    return (
        events.withColumn("fp", fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
