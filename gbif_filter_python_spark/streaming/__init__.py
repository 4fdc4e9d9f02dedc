"""Structured Streaming operators (SURVEY.md §7.1 step 8)."""

from gbif_filter_python_spark.streaming.windows import (
    windowed_event_counts,
    stream_events,
)

__all__ = ["windowed_event_counts", "stream_events"]
