from analyst_spark.streaming.events import (
    hourly_rollup_stream,
    read_events_stream,
    sessionize_stream,
)

__all__ = [
    "read_events_stream",
    "hourly_rollup_stream",
    "sessionize_stream",
]
