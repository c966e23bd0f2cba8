"""The events-reading operator family against the REAL testdata parquet.

Round-3 regression: the driver regenerated the events table with a new
physical ts encoding (plain ``timestamp[us]``, read by Spark 4 as
TIMESTAMP_NTZ, where earlier generations shipped TIMESTAMP(NANOS) read
as long nanos) and ``interval_join``'s dtype check missed it — the unit
suite never caught this because it built frames via ``createDataFrame``,
which always yields TIMESTAMP_LTZ. These tests pin the scan-layer
normalization and run every events-consuming operator family over the
file the driver actually ships, so a future encoding change fails HERE
instead of in the driver bench.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from sales_forecast_pyspark_spark.operators.asof import asof_join
from sales_forecast_pyspark_spark.operators.interval import interval_join
from sales_forecast_pyspark_spark.sources.readers import (
    normalize_event_ts,
    read_table,
)

from conftest import SF_SMALL


def test_read_table_canonicalizes_ts_to_timestamp(spark):
    ev = read_table(spark, SF_SMALL, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # Values must be real event times, not a units-confused cast.
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    assert lo.year >= 1990 and hi.year <= 2100


def test_normalize_event_ts_all_encodings(spark):
    base = datetime.datetime(2024, 5, 1, 12, 30, 45, 123456)
    micros = int(base.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)

    nanos_df = spark.createDataFrame([(micros * 1000,)], "ts long")
    ntz_df = spark.sql(
        f"SELECT timestamp_ntz '{base.isoformat(sep=' ')}' AS ts"
    )
    ltz_df = spark.createDataFrame([(base,)], "ts timestamp")

    outs = [normalize_event_ts(df) for df in (nanos_df, ntz_df, ltz_df)]
    for out in outs:
        assert dict(out.dtypes)["ts"] == "timestamp"
    vals = {out.first()["ts"] for out in outs}
    assert vals == {base}, vals


@pytest.fixture(scope="module")
def raw_events_ntz(spark):
    """The events table as the parquet reader surfaces it, WITHOUT the
    scan layer's normalization — on current testdata this is
    TIMESTAMP_NTZ, the encoding that broke round 3."""
    df = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":  # old nanos encoding
        pytest.skip("testdata predates the timestamp[us] encoding")
    return df


def test_interval_join_on_raw_ntz_events(spark, raw_events_ntz):
    """interval_join must accept whatever dtype the reader surfaces."""
    ev = raw_events_ntz
    points = ev.select("event_id", "user_id", "ts", "value")
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("win_end"),
    )
    joined = interval_join(
        points, intervals, "ts", "win_start", "win_end",
        on=["user_id"], bin_width=300,
    )
    # Every error event matches at least itself (win_start == its own ts).
    n_errors = intervals.count()
    n_self = joined.filter(F.col("event_id") == F.col("error_id")).count()
    assert n_errors > 0 and n_self == n_errors


def test_asof_join_on_raw_ntz_events(spark, raw_events_ntz):
    """asof_join over the raw-encoded table: each error event's most
    recent same-user purchase at-or-before it, cross-checked against a
    direct per-row max aggregation."""
    ev = raw_events_ntz
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    got = asof_join(
        errors, purchases, on="user_id", left_time="ts", right_time="p_ts",
        value_cols=["p_value"], matched_time_col="matched_ts",
    )
    expect = (
        errors.join(purchases, "user_id")
        .filter(F.col("p_ts") <= F.col("ts"))
        .groupBy("event_id")
        .agg(F.max("p_ts").alias("matched_ts"))
    )
    diff = (
        got.select("event_id", "matched_ts")
        .filter(F.col("matched_ts").isNotNull())
        .exceptAll(expect)
    )
    assert got.count() == errors.count()
    assert diff.count() == 0


def test_registered_event_queries_run_on_real_parquet(spark):
    """Smoke the whole events-consuming registry block at sf0.001 — the
    driver-shaped end-to-end path (read_table + query builder)."""
    from sales_forecast_pyspark_spark.plans.queries import QUERIES

    for name in (
        "events_window",
        "sessionization",
        "events_near_errors",
        "asof_last_purchase",
        "user_daily_locf",
        "latest_events_per_user",
    ):
        out = QUERIES[name].builder(spark, SF_SMALL)
        assert out.count() > 0, name


def test_funnel_strict_ordering_semantics(spark):
    """Funnel steps must be matched at the earliest ELIGIBLE time, not
    the global min: a user whose only purchase precedes their first
    eligible view must not count in step 3, and step counts are
    monotonically non-increasing."""
    from datetime import datetime

    from sales_forecast_pyspark_spark.operators.rowops import funnel_counts

    t = lambda s: datetime.fromisoformat(f"2024-01-01 {s}")
    rows = [
        # u1 completes in order
        (1, t("09:00:00"), 1, "signup", 0.0, "{}"),
        (2, t("10:00:00"), 1, "view", 0.0, "{}"),
        (3, t("11:00:00"), 1, "purchase", 0.0, "{}"),
        # u2: purchase BEFORE the post-signup view -> stops at step 2
        (4, t("09:00:00"), 2, "signup", 0.0, "{}"),
        (5, t("09:30:00"), 2, "purchase", 0.0, "{}"),
        (6, t("10:00:00"), 2, "view", 0.0, "{}"),
        # u3: never signs up -> counts nowhere
        (7, t("08:00:00"), 3, "view", 0.0, "{}"),
        (8, t("09:00:00"), 3, "purchase", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        r["step"]: r["n_entities"]
        for r in funnel_counts(ev, ["signup", "view", "purchase"]).collect()
    }
    assert got == {"signup": 2, "view": 2, "purchase": 1}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ev = st.lists(
    st.tuples(
        st.integers(0, 3),                    # user
        st.integers(0, 20),                   # minute offset
        st.sampled_from(["signup", "view", "purchase"]),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_ev)
def test_funnel_property_matches_brute_force(spark, evs):
    """funnel_counts == per-user greedy earliest-eligible walk for
    arbitrary event layouts (ties broken by time only — minute offsets
    are made unique per user to keep the brute force well-defined)."""
    from datetime import datetime, timedelta

    from sales_forecast_pyspark_spark.operators.rowops import funnel_counts

    base = datetime.fromisoformat("2024-01-01 00:00:00")
    # de-duplicate (user, minute) so event order is total per user
    seen, rows = set(), []
    for i, (u, m, t) in enumerate(evs):
        while (u, m) in seen:
            m += 100
        seen.add((u, m))
        rows.append((i, base + timedelta(minutes=m), u, t, 0.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    steps = ["signup", "view", "purchase"]
    got = {r["step"]: r["n_entities"] for r in funnel_counts(ev, steps).collect()}

    by_user = {}
    for _, ts, u, t, _v, _p in rows:
        by_user.setdefault(u, []).append((ts, t))
    expect = {s: 0 for s in steps}
    for events in by_user.values():
        events.sort()
        t_prev = None
        for idx, step in enumerate(steps):
            cand = [ts for ts, t in events if t == step and (t_prev is None or ts > t_prev)]
            if not cand:
                break
            t_prev = min(cand)
            expect[step] += 1
    assert got == expect, (got, expect)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_ev)
def test_transition_matrix_property_matches_brute_force(spark, evs):
    """transition_matrix == counting consecutive pairs along each
    user's (ts, event_id)-sorted timeline, with per-source-state
    probability normalization."""
    from collections import Counter
    from datetime import datetime, timedelta

    from sales_forecast_pyspark_spark.operators.windows import transition_matrix

    base = datetime.fromisoformat("2024-01-01 00:00:00")
    rows = [
        (i, base + timedelta(minutes=m), u, t, 0.0, "{}")
        for i, (u, m, t) in enumerate(evs)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in transition_matrix(ev, order_tiebreak="event_id").collect()
    }
    by_user = {}
    for i, ts, u, t, _v, _p in rows:
        by_user.setdefault(u, []).append((ts, i, t))
    pairs = Counter()
    for events in by_user.values():
        events.sort()
        for (_, _, a), (_, _, b) in zip(events, events[1:]):
            pairs[(a, b)] += 1
    outgoing = Counter()
    for (a, _b), n in pairs.items():
        outgoing[a] += n
    expect = {
        k: (n, round(n / outgoing[k[0]], 4)) for k, n in pairs.items()
    }
    assert got == expect, (got, expect)
