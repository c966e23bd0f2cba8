"""Sketch tier vs exact tier: HLL++ distinct counts and Greenwald-Khanna
percentiles must land within their documented error bounds, and the
sketch plans must be single-shuffle (no Expand)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_forecast_pyspark_spark.operators.sketches import (
    distinct_count,
    quantile_exprs,
)
from sales_forecast_pyspark_spark.sources.readers import read_table
from tests.conftest import SF_ORACLE


def test_hll_within_rsd_of_exact(spark):
    ev = read_table(spark, SF_ORACLE, "events")
    exact = {
        r["event_type"]: r["n_user_id"]
        for r in distinct_count(ev, ["event_type"], "user_id").collect()
    }
    approx = {
        r["event_type"]: r["n_user_id"]
        for r in distinct_count(ev, ["event_type"], "user_id", rsd=0.01).collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.05 * n), (k, approx[k], n)


def test_gk_percentiles_within_rank_error(spark):
    ev = read_table(spark, SF_ORACLE, "events")
    probs = [0.5, 0.9]
    exact = ev.groupBy("event_type").agg(*quantile_exprs("value", probs)).collect()
    approx = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(*quantile_exprs("value", probs, accuracy=10000))
        .collect()
    }
    # rank error <= 1/accuracy; values here span ~[0, 50], so a loose
    # value-domain tolerance is enough to catch a broken sketch
    for r in exact:
        a = approx[r["event_type"]]
        for c in ("p50", "p90"):
            assert abs(a[c] - r[c]) <= 0.5, (r["event_type"], c, a[c], r[c])


def test_sketch_plans_are_single_shuffle(spark):
    ev = read_table(spark, SF_ORACLE, "events")
    exact_plan = (
        distinct_count(ev, ["event_type"], "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    hll_plan = (
        distinct_count(ev, ["event_type"], "user_id", rsd=0.05)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exact distinct re-aggregates through a second shuffle keyed on
    # (group, value); the HLL sketch is a plain one-shuffle aggregate
    assert exact_plan.count("Exchange hashpartitioning") == 2
    assert hll_plan.count("Exchange hashpartitioning") == 1


def test_hll_rollup_merges_consistently_and_bounds_error(spark):
    """The mergeable-sketch contract: (a) estimating at the coarse grain
    via unioned fine-grain sketches gives EXACTLY the same answer as
    sketching the coarse grain directly (register-wise max is
    merge-order independent), and (b) the estimate lands within HLL's
    published error envelope of the exact count (rsd ≈ 1.04/sqrt(2^12)
    ≈ 1.6%; assert 5% for slack)."""
    from sales_forecast_pyspark_spark.operators.sketches import hll_rollup

    ev = read_table(spark, SF_ORACLE, "events").withColumn("day", F.to_date("ts"))

    merged = hll_rollup(ev, ["event_type", "day"], ["event_type"], "user_id")
    direct = hll_rollup(ev, ["event_type"], ["event_type"], "user_id")
    m = {r["event_type"]: r["n_user_id"] for r in merged.collect()}
    d = {r["event_type"]: r["n_user_id"] for r in direct.collect()}
    assert m == d

    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(m) == set(exact)
    for et, est in m.items():
        assert abs(est - exact[et]) / exact[et] < 0.05, (et, est, exact[et])
