from analyst_spark.streaming.dedup import dedup_stream, dedup_stream_by_content
from analyst_spark.streaming.events import (
    hourly_rollup_stream,
    read_events_stream,
    sessionize_stream,
)
from analyst_spark.streaming.joins import (
    stream_to_partitioned_lake,
    view_click_attribution_stream,
)
from analyst_spark.streaming.stateful import running_user_totals

__all__ = [
    "read_events_stream",
    "hourly_rollup_stream",
    "sessionize_stream",
    "running_user_totals",
    "dedup_stream",
    "dedup_stream_by_content",
    "view_click_attribution_stream",
    "stream_to_partitioned_lake",
]
