"""Unit tests for the r05 operators: market-basket co-occurrence/lift
(operators/baskets.py) and rolling z-score anomalies
(operators/anomaly.py) — hand-computable synthetic inputs, plus the
guards (mega-basket cap, min_obs, zero-variance) that matter at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_forecast_pyspark_spark.operators.anomaly import rolling_zscore_anomalies
from sales_forecast_pyspark_spark.operators.baskets import (
    basket_item_pairs,
    basket_lift,
)


def _baskets(spark):
    # b1: {x, y, z}; b2: {x, y}; b3: {x}; b4: {y, z} — with a duplicate
    # (b1, x) line that must count once.
    rows = [
        (1, "x"), (1, "x"), (1, "y"), (1, "z"),
        (2, "x"), (2, "y"),
        (3, "x"),
        (4, "y"), (4, "z"),
    ]
    return spark.createDataFrame(rows, "b long, i string")


def test_pair_counts_dedupe_within_basket(spark):
    got = {
        (r["item_a"], r["item_b"]): r["n_baskets_together"]
        for r in basket_item_pairs(_baskets(spark), "b", "i").collect()
    }
    assert got == {("x", "y"): 2, ("x", "z"): 1, ("y", "z"): 2}


def test_mega_basket_capped(spark):
    df = _baskets(spark)
    wide = spark.createDataFrame(
        [(9, f"i{k}") for k in range(50)], "b long, i string"
    )
    got = basket_item_pairs(df.unionByName(wide), "b", "i", max_basket_size=10)
    # the 50-item basket would contribute 1225 pairs; the cap drops it
    assert got.count() == 3


def test_lift_exact_values(spark):
    # n_baskets=4; n_x=3, n_y=3, n_z=2; xy together 2 → lift = 2*4/(3*3)
    got = {
        (r["item_a"], r["item_b"]): (r["n_baskets_together"], r["lift"])
        for r in basket_lift(
            _baskets(spark), "b", "i", min_pair_support=1, top_k=10
        ).collect()
    }
    assert got[("x", "y")] == (2, round(2 * 4 / 9, 4))
    assert got[("y", "z")] == (2, round(2 * 4 / 6, 4))
    assert got[("x", "z")] == (1, round(1 * 4 / 6, 4))


def test_lift_support_and_topk_are_total_ordered(spark):
    out = basket_lift(_baskets(spark), "b", "i", min_pair_support=2, top_k=1)
    rows = out.collect()
    # support-2 pairs are (x,y) and (y,z); the (item_a, item_b)
    # tie-break makes top-1 deterministic
    assert [(r["item_a"], r["item_b"]) for r in rows] == [("x", "y")]


def _series(spark, values, key="a"):
    return spark.createDataFrame(
        [(key, i, float(v)) for i, v in enumerate(values)],
        "k string, t long, x double",
    )


def test_zscore_flags_injected_spike(spark):
    vals = [10, 11, 9, 10, 12, 10, 9, 11, 10, 100]  # spike at t=9
    got = rolling_zscore_anomalies(
        _series(spark, vals), ["k"], "t", "x", window=28, min_obs=5, z_threshold=3.0
    ).collect()
    assert [r["t"] for r in got] == [9]
    assert got[0]["z"] > 3


def test_zscore_constant_series_never_flags(spark):
    got = rolling_zscore_anomalies(
        _series(spark, [5] * 20), ["k"], "t", "x", window=28, min_obs=5
    )
    assert got.count() == 0  # zero variance → no flag, no div-by-zero


def test_zscore_respects_min_obs(spark):
    # spike at t=3 with only 3 prior observations
    got = rolling_zscore_anomalies(
        _series(spark, [10, 11, 9, 100]), ["k"], "t", "x", window=28, min_obs=5
    )
    assert got.count() == 0


def test_zscore_frame_excludes_current_row(spark):
    # If the frame (wrongly) included the current row, the spike would
    # inflate its own mean/std and shrink z; with the trailing frame the
    # expectation is the pre-spike mean.
    vals = [10, 11, 9, 10, 12, 10, 9, 11, 10, 100]
    got = rolling_zscore_anomalies(
        _series(spark, vals), ["k"], "t", "x", window=28, min_obs=5
    ).collect()
    assert got[0]["exp_val"] == round(sum(vals[:9]) / 9, 4)
