"""Batch-stream equivalence: the streaming window/session aggregations
must produce exactly the batch query's results once the stream drains
(availableNow + complete mode).
"""

from __future__ import annotations

from sales_forecast_pyspark_spark.plans.queries import QUERIES
from sales_forecast_pyspark_spark.streaming import (
    run_available_now,
    sessionize_stream,
    stream_events,
    windowed_event_totals,
)

from tests.conftest import SF_SMALL


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_window_matches_batch(spark):
    stream = windowed_event_totals(stream_events(spark, SF_SMALL))
    got = run_available_now(stream, "stream_win_test")
    batch = QUERIES["events_window"].builder(spark, SF_SMALL)
    cols = ["event_type", "win_start", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert got.count() > 0


def test_streaming_sessionization_matches_batch(spark):
    stream = sessionize_stream(stream_events(spark, SF_SMALL))
    got = run_available_now(stream, "stream_sess_test")
    batch = QUERIES["sessionization"].builder(spark, SF_SMALL)
    cols = ["user_id", "session_start", "last_event", "n_events"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert got.count() > 0
