"""interval_join: brute-force parity, bin-boundary edges, the fan-out
guard, and the no-BNLJ plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_forecast_pyspark_spark.operators.interval import interval_join


@pytest.fixture(scope="module")
def numeric_frames(spark):
    # points at bin edges (bin_width=10): 0, 9, 10, 25, null
    points = spark.createDataFrame(
        [(1, 0), (2, 9), (3, 10), (4, 25), (5, None)],
        "pid long, t long",
    )
    # intervals crossing bins, exact-edge, degenerate single-point
    intervals = spark.createDataFrame(
        [(100, 0, 9), (101, 9, 10), (102, 25, 25), (103, 5, 35)],
        "iid long, lo long, hi long",
    )
    return points, intervals


def test_matches_brute_force(spark, numeric_frames):
    points, intervals = numeric_frames
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, "t", "lo", "hi", bin_width=10
        ).collect()
    }
    brute = {
        (p["pid"], i["iid"])
        for p in points.collect()
        for i in intervals.collect()
        if p["t"] is not None and i["lo"] <= p["t"] <= i["hi"]
    }
    assert got == brute
    # spot the edges: inclusive both ends, cross-bin intervals seen
    assert (2, 100) in got and (2, 101) in got  # t=9 hits [0,9] and [9,10]
    assert (3, 101) in got  # t=10 upper bound inclusive
    assert (4, 102) in got  # degenerate [25,25]
    assert not any(pid == 5 for pid, _ in got)  # null time never matches


@pytest.mark.slow
def test_bin_width_invariance(spark, numeric_frames):
    points, intervals = numeric_frames
    results = [
        {
            (r["pid"], r["iid"])
            for r in interval_join(
                points, intervals, "t", "lo", "hi", bin_width=w
            ).collect()
        }
        for w in (1, 3, 10, 1000)
    ]
    assert all(r == results[0] for r in results)


def test_fanout_guard_raises(spark):
    points = spark.createDataFrame([(1, 0)], "pid long, t long")
    wide = spark.createDataFrame([(1, 0, 10_000_000)], "iid long, lo long, hi long")
    with pytest.raises(ValueError, match="max_bins"):
        interval_join(points, wide, "t", "lo", "hi", bin_width=10, max_bins=100)
    # validate=False skips the guard (caller takes responsibility)
    df = interval_join(
        points, wide, "t", "lo", "hi", bin_width=10_000_000, max_bins=1,
        validate=False,
    )
    assert df.count() == 1


def test_null_interval_bounds_rejected(spark):
    points = spark.createDataFrame([(1, 0)], "pid long, t long")
    nullable = spark.createDataFrame([(1, None, 5)], "iid long, lo long, hi long")
    with pytest.raises(ValueError, match="null bounds"):
        interval_join(points, nullable, "t", "lo", "hi", bin_width=10)


def test_column_collision_raises(spark):
    points = spark.createDataFrame([(1, 0)], "pid long, t long")
    intervals = spark.createDataFrame([(2, 0, 5)], "pid long, lo long, hi long")
    with pytest.raises(ValueError, match="collide"):
        interval_join(points, intervals, "t", "lo", "hi", bin_width=10)


def test_plan_has_no_nested_loop(spark, numeric_frames):
    points, intervals = numeric_frames
    plan = (
        interval_join(points, intervals, "t", "lo", "hi", bin_width=10, validate=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BroadcastNestedLoop", "CartesianProduct"):
        assert bad not in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=10),
    st.lists(st.tuples(st.integers(0, 60), st.integers(0, 15)), min_size=1, max_size=8),
    st.sampled_from([1, 7, 16]),
)
@pytest.mark.slow
def test_interval_property_matches_brute_force(spark, times, spans, bin_width):
    points = spark.createDataFrame(
        [(i, t) for i, t in enumerate(times)], "pid long, t long"
    )
    intervals = spark.createDataFrame(
        [(i, lo, lo + width) for i, (lo, width) in enumerate(spans)],
        "iid long, lo long, hi long",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, "t", "lo", "hi", bin_width=bin_width
        ).collect()
    }
    brute = {
        (pi, ii)
        for pi, t in enumerate(times)
        for ii, (lo, width) in enumerate(spans)
        if lo <= t <= lo + width
    }
    assert got == brute


def test_scd2_intervals_tile_each_key_timeline(spark):
    """SCD-2 validity intervals must tile each key's timeline: exactly
    one is_current row per key (null valid_to), every other row's
    valid_to equals the next row's valid_from (half-open, no gaps or
    overlaps), and ties in the version column are ordered by the
    unique tie-break."""
    from sales_forecast_pyspark_spark.operators.rowops import scd2_intervals

    rows = [
        (1, 10, 100, "a"),
        (1, 20, 101, "b"),
        (1, 20, 102, "c"),  # same version instant, id tie-break
        (2, 5, 103, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, v long, uid long, payload string")
    got = sorted(
        (
            (r["k"], r["valid_from"], r["valid_to"], r["is_current"], r["payload"])
            for r in scd2_intervals(df, ["k"], ["v", "uid"]).collect()
        ),
        key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0, t[4]),
    )
    assert got == [
        (1, 10, 20, False, "a"),
        (1, 20, 20, False, "b"),   # zero-length interval for the tie loser
        (1, 20, None, True, "c"),
        (2, 5, None, True, "x"),
    ]


def test_scd2_apply_changes_equals_full_rebuild(spark):
    """The incremental MERGE twin must be row-identical to rebuilding
    scd2_intervals over the combined changelog — including when the
    batch carries a LATE version older than a key's existing history
    (the append-only-merge bug this operator structurally avoids)."""
    from sales_forecast_pyspark_spark.operators.rowops import (
        scd2_apply_changes,
        scd2_intervals,
    )
    from sales_forecast_pyspark_spark.sources.readers import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    first = ev.filter(F.col("event_id") % 4 != 0)
    batch = ev.filter(F.col("event_id") % 4 == 0)  # interleaved in time:
    # most batch versions predate some existing version of their key,
    # so this is overwhelmingly the late-arrival path.
    base = scd2_intervals(first, ["user_id"], ["ts", "event_id"])
    merged = scd2_apply_changes(base, batch, ["user_id"], ["ts", "event_id"])
    full = scd2_intervals(ev, ["user_id"], ["ts", "event_id"])
    key = lambda r: (r["user_id"], r["ts"], r["event_id"])
    assert sorted(map(tuple, merged.collect()), key=lambda t: (t[0], t[1], t[2])) == sorted(
        map(tuple, full.collect()), key=lambda t: (t[0], t[1], t[2])
    )
    # untouched keys must NOT have been re-derived: their rows come from
    # the pass-through side (plan check: left_anti present)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "LeftSemi" in plan


def test_concurrency_profile_matches_brute_force_stabbing(spark):
    """Sweep-line open-interval counts vs literal per-boundary stabbing
    on an engineered set: nesting, identical intervals, zero-length
    ([d, d) contributes nothing net), and a same-day open+close pile-up."""
    from datetime import date

    from pyspark.sql import functions as F

    from sales_forecast_pyspark_spark.operators.interval import (
        concurrency_profile,
    )

    iv = [
        (date(2024, 1, 1), date(2024, 1, 10)),
        (date(2024, 1, 2), date(2024, 1, 4)),   # nested
        (date(2024, 1, 2), date(2024, 1, 4)),   # duplicate
        (date(2024, 1, 4), date(2024, 1, 4)),   # zero-length
        (date(2024, 1, 4), date(2024, 1, 6)),   # opens the day others close
    ]
    df = spark.createDataFrame(iv, "s date, e date")
    got = {
        str(r["boundary"]): (r["net"], r["n_open"])
        for r in concurrency_profile(df, "s", "e").collect()
    }
    boundaries = sorted({d for pair in iv for d in pair})
    for b in boundaries:
        stab = sum(1 for s, e in iv if s <= b < e)
        assert got[str(b)][1] == stab, (b, got[str(b)], stab)
    assert set(got) == {str(b) for b in boundaries}
