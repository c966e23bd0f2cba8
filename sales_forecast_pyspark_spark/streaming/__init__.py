"""Structured Streaming operators (SURVEY.md §2.10 extension)."""

from sales_forecast_pyspark_spark.streaming.stream_ops import (
    dedup_stream,
    run_available_now,
    running_user_totals,
    sessionize_stream,
    stream_events,
    stream_join_near_errors,
    windowed_event_totals,
)

__all__ = [
    "dedup_stream",
    "run_available_now",
    "running_user_totals",
    "sessionize_stream",
    "stream_events",
    "stream_join_near_errors",
    "windowed_event_totals",
]
