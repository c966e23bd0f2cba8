"""As-of join semantics: pandas merge_asof parity, inclusive ties,
direction, tolerance, and the no-match/null-time edges."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pyspark.sql.functions as F
import pytest

from sales_forecast_pyspark_spark.operators.asof import asof_join


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), "a"),
            (1, ts("2024-01-01 12:00:00"), "b"),
            (1, ts("2024-01-01 09:00:00"), "pre"),
            (2, ts("2024-01-01 11:00:00"), "other-key"),
            (3, ts("2024-01-01 11:00:00"), "no-right-rows"),
        ],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:30:00"), 10.0, 100),
            (1, ts("2024-01-01 12:00:00"), 20.0, 101),  # tie with left "b"
            (2, ts("2024-01-01 11:30:00"), 30.0, 102),  # after left row
        ],
        "k long, t timestamp, v double, rid long",
    )
    return left, right


def collect_map(df, key_cols=("k", "tag")):
    return {tuple(r[c] for c in key_cols): r.asDict() for r in df.collect()}


def test_backward_matches_merge_asof(spark, frames):
    left, right = frames
    got = asof_join(
        left, right, on="k", left_time="t",
        value_cols=["v", "rid"], right_order="rid",
    )
    lp = left.toPandas().sort_values("t")
    rp = right.toPandas().sort_values("t")
    exp = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    exp_map = {
        (r.k, r.tag): None if pd.isna(r.v) else r.v for r in exp.itertuples()
    }
    got_map = {(r["k"], r["tag"]): r["v"] for r in collect_map(got).values()}
    assert got_map == exp_map
    # tie at 12:00 is inclusive: left "b" sees the 12:00 right row
    assert got_map[(1, "b")] == 20.0
    # right row after the left time never matches backward
    assert got_map[(2, "other-key")] is None
    assert got_map[(3, "no-right-rows")] is None


def test_forward_direction(spark, frames):
    left, right = frames
    got = collect_map(
        asof_join(
            left, right, on="k", left_time="t",
            value_cols=["v"], right_order="rid", direction="forward",
        )
    )
    assert got[(1, "pre")]["v"] == 10.0  # next right at 09:30
    assert got[(1, "a")]["v"] == 20.0  # next right at 12:00
    assert got[(1, "b")]["v"] == 20.0  # inclusive tie
    assert got[(2, "other-key")]["v"] == 30.0
    assert got[(3, "no-right-rows")]["v"] is None


def test_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    got = collect_map(
        asof_join(
            left, right, on="k", left_time="t",
            value_cols=["v"], right_order="rid",
            tolerance=F.expr("INTERVAL 1 HOUR"),
            matched_time_col="matched_t",
        )
    )
    # 10:00 left vs 09:30 right: 30 min, inside tolerance
    assert got[(1, "a")]["v"] == 10.0
    assert got[(1, "a")]["matched_t"] == ts("2024-01-01 09:30:00")
    # tie match is 0 distance
    assert got[(1, "b")]["v"] == 20.0
    # 09:00 left has no prior right at all
    assert got[(1, "pre")]["v"] is None
    assert got[(1, "pre")]["matched_t"] is None


def test_duplicate_right_times_pick_greatest_order(spark):
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 10, "first", 1), (1, 10, "second", 2)],
        "k long, t long, label string, rid long",
    )
    got = asof_join(
        left, right, on="k", left_time="t",
        value_cols=["label"], right_order="rid",
    ).collect()
    assert got[0]["label"] == "second"


def test_null_left_time_never_matches(spark):
    left = spark.createDataFrame([(1, None), (1, 5)], "k long, t long")
    right = spark.createDataFrame([(1, 1, 7.0)], "k long, t long, v double")
    got = {r["t"]: r["v"] for r in asof_join(
        left, right, on="k", left_time="t", value_cols=["v"]
    ).collect()}
    assert got[5] == 7.0
    assert got[None] is None


def test_value_col_collision_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_time="t", value_cols=["tag"])


def test_single_shuffle_plan(spark, frames):
    left, right = frames
    plan = asof_join(
        left, right, on="k", left_time="t", value_cols=["v"], right_order="rid"
    )._jdf.queryExecution().executedPlan().toString()
    # one exchange for the key partitioning, no join node at all
    assert plan.count("Exchange hashpartitioning") == 1
    for bad in ("SortMergeJoin", "BroadcastNestedLoop", "Cartesian"):
        assert bad not in plan


def test_stratified_sample_deterministic_mode(spark):
    """Deterministic stratified sampling: reproducible across calls and
    repartitioning, approximately honoring per-stratum fractions,
    dropping unlisted strata."""
    from sales_forecast_pyspark_spark.operators.rowops import stratified_sample
    from sales_forecast_pyspark_spark.sources.readers import read_table

    ev = read_table(spark, "/root/testdata/sf0.01", "events")
    fracs = {"click": 0.5, "error": 0.1}
    a = stratified_sample(ev, "event_type", fracs, deterministic=True)
    b = stratified_sample(ev.repartition(7), "event_type", fracs, deterministic=True)
    ids_a = sorted(r["event_id"] for r in a.collect())
    ids_b = sorted(r["event_id"] for r in b.collect())
    assert ids_a == ids_b  # partition-layout invariant
    counts = {r["event_type"]: r["count"] for r in a.groupBy("event_type").count().collect()}
    assert set(counts) <= {"click", "error"}  # unlisted strata dropped
    totals = {r["event_type"]: r["count"] for r in ev.groupBy("event_type").count().collect()}
    for t, frac in fracs.items():
        got_frac = counts.get(t, 0) / totals[t]
        assert abs(got_frac - frac) < 0.1, (t, got_frac)
    # seeded sampleBy mode runs and respects the strata filter
    s = stratified_sample(ev, "event_type", fracs, seed=7)
    assert set(r["event_type"] for r in s.select("event_type").distinct().collect()) <= set(fracs)


def test_stratified_sample_raw_key_mode_exact(spark):
    """key= mode thresholds the raw residue of the key column — the
    membership is a closed-form predicate (id % scale < frac·scale), so
    the sample is exactly computable by any engine (the oracle path)."""
    from sales_forecast_pyspark_spark.operators.rowops import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(200)], "id long, s string"
    )
    out = stratified_sample(
        df, "s", {"a": 0.3, "b": 1.0}, deterministic=True, key="id", scale=10
    )
    got = sorted(r["id"] for r in out.collect())
    want = [i for i in range(200) if i % 10 < (3 if i % 2 == 0 else 10)]
    assert got == want


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_row = st.tuples(st.integers(0, 2), st.integers(0, 50))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(_row, min_size=1, max_size=12),
    st.lists(_row, min_size=1, max_size=12),
)
def test_asof_property_matches_brute_force(spark, lefts, rights):
    """Backward as-of on random (key, time) layouts == argmax of
    right times <= left time, greatest right_order on ties."""
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k long, t long, lid long"
    )
    right = spark.createDataFrame(
        [(k, t, i, float(i)) for i, (k, t) in enumerate(rights)],
        "k long, t long, rid long, v double",
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on="k", left_time="t",
            value_cols=["rid", "v"], right_order="rid",
        ).collect()
    }
    for i, (k, t) in enumerate(lefts):
        cands = [
            (rt, ri) for ri, (rk, rt) in enumerate(rights) if rk == k and rt <= t
        ]
        expect = max(cands)[1] if cands else None
        assert got[i] == expect, (i, k, t, cands)


def test_duplicate_right_times_with_tolerance_oracle_parity(spark):
    """The combined edge the per-feature tests miss: several right rows
    share the matched (key, timestamp) AND a tolerance bound is active.
    Pinned against a DuckDB replay of the asof_last_purchase oracle
    shape (union-then-window, greatest-order tie-break) with the
    tolerance predicate applied on top, so operator and oracle agree on
    BOTH who wins the tie and when the match is too stale."""
    import duckdb

    left_rows = [
        (1, ts("2024-01-01 12:00:00"), "tie-at-left-time"),
        (1, ts("2024-01-01 12:30:00"), "tie-in-tolerance"),
        (1, ts("2024-01-01 14:00:00"), "tie-too-stale"),
        (2, ts("2024-01-01 12:00:00"), "dup-before-left"),
        (2, ts("2024-01-01 11:00:00"), "before-any-right"),
    ]
    right_rows = [
        # key 1: three rows at the SAME instant — rid 12 must win
        (1, ts("2024-01-01 12:00:00"), 10.0, 10),
        (1, ts("2024-01-01 12:00:00"), 11.0, 11),
        (1, ts("2024-01-01 12:00:00"), 12.0, 12),
        # key 2: duplicate instant strictly before the left time
        (2, ts("2024-01-01 11:30:00"), 20.0, 20),
        (2, ts("2024-01-01 11:30:00"), 21.0, 21),
    ]
    left = spark.createDataFrame(left_rows, "k long, t timestamp, tag string")
    right = spark.createDataFrame(
        right_rows, "k long, t timestamp, v double, rid long"
    )
    got = collect_map(
        asof_join(
            left, right, on="k", left_time="t",
            value_cols=["v", "rid"], right_order="rid",
            tolerance=F.expr("INTERVAL 1 HOUR"),
        )
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l AS SELECT * FROM (VALUES "
        + ", ".join(f"({k}, TIMESTAMP '{t}', '{tag}')" for k, t, tag in left_rows)
        + ") AS t(k, t, tag)"
    )
    con.execute(
        "CREATE TABLE r AS SELECT * FROM (VALUES "
        + ", ".join(f"({k}, TIMESTAMP '{t}', {v}, {rid})" for k, t, v, rid in right_rows)
        + ") AS t(k, t, v, rid)"
    )
    oracle = {
        (k, tag): (v, rid)
        for k, tag, v, rid in con.execute(
            """
WITH u AS (
  SELECT k, t, 0 AS side, rid AS ord, t AS rt, v AS r_v, rid AS r_rid,
         NULL::VARCHAR AS tag FROM r
  UNION ALL
  SELECT k, t, 1 AS side, NULL, NULL, NULL, NULL, tag FROM l
), w AS (
  SELECT k, tag, t, side,
         last_value(rt IGNORE NULLS) OVER win AS rt,
         last_value(r_v IGNORE NULLS) OVER win AS r_v,
         last_value(r_rid IGNORE NULLS) OVER win AS r_rid
  FROM u
  WINDOW win AS (PARTITION BY k ORDER BY t, side, ord
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT k, tag,
       CASE WHEN rt >= t - INTERVAL 1 HOUR THEN r_v END AS v,
       CASE WHEN rt >= t - INTERVAL 1 HOUR THEN r_rid END AS rid
FROM w WHERE side = 1
"""
        ).fetchall()
    }
    assert set(got) == set(oracle)
    for key, row in got.items():
        assert (row["v"], row["rid"]) == oracle[key], (key, row, oracle[key])
    # and the specific pins, so a joint regression in both engines fails too:
    assert got[(1, "tie-at-left-time")]["rid"] == 12   # greatest order wins the tie
    assert got[(1, "tie-in-tolerance")]["rid"] == 12   # 30 min stale, in range
    assert got[(1, "tie-too-stale")]["rid"] is None    # 2 h stale, nulled
    assert got[(2, "dup-before-left")]["rid"] == 21
    assert got[(2, "before-any-right")]["rid"] is None
