"""Sketch tier vs exact tier: HLL++ distinct counts and Greenwald-Khanna
percentiles must land within their documented error bounds, and the
sketch plans must be single-shuffle (no Expand)."""

from __future__ import annotations

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
