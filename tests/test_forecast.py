"""Forecast-pipeline tests (M1-M10): indexer/assembler semantics, preset
configs, one-pass-vs-MLlib evaluator parity, coefficient introspection,
segmented fit, and run-to-run stability of the flagship LR query.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sales_forecast_pyspark_spark.forecast import (
    build_features,
    feature_pipeline,
    fit_per_segment,
    gbt_preset,
    lr_coefficients,
    lr_preset,
    mllib_metrics,
    prepare_features,
    rf_preset,
    train_and_eval,
)
from sales_forecast_pyspark_spark.functions.metrics import regression_metrics

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def tiny_panel(spark):
    rows = []
    for c in ("UK", "DE"):
        for d in range(1, 21):
            rows.append((c, "S1", f"2024-01-{d:02d}", float(d % 7 + 1), 2.5))
    df = spark.createDataFrame(rows, "country string, stock string, ds string, qty double, avg_price double")
    return df.withColumn("ds", F.col("ds").cast("date")).withColumn(
        "dow", F.dayofweek("ds")
    )


def test_string_indexer_keep_handles_unseen(spark):
    """M1: handleInvalid="keep" maps categories unseen at fit time to an
    extra index instead of failing at transform."""
    train = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "c string, x double")
    test = spark.createDataFrame([("a", 1.0), ("ZZZ", 3.0)], "c string, x double")
    pipe = feature_pipeline(["c"], ["x"])
    _, train_p, test_p = prepare_features(pipe, train, test)
    assert test_p.count() == 2  # unseen "ZZZ" kept, not dropped/failed
    idx = {r["c"]: r["c_idx"] for r in test_p.collect()}
    assert idx["ZZZ"] == 2.0  # extra bucket beyond the 2 fitted labels


def test_vector_assembler_skip_drops_null_rows(spark):
    """M2: handleInvalid="skip" silently drops rows with null features."""
    train = spark.createDataFrame([("a", 1.0), ("b", None)], "c string, x double")
    pipe = feature_pipeline(["c"], ["x"])
    fitted = pipe.fit(train.fillna(0))
    assert fitted.transform(train).count() == 1


def test_build_features_reference_shape(tiny_panel):
    """Default preset = the reference's 36 lags + 18 rolling + 12 diffs."""
    _, names = build_features(tiny_panel)
    lags = [n for n in names if "lag" in n or "_cyc" in n]
    rolls = [n for n in names if n.startswith(("roll_", "dow_roll_"))]
    diffs = [n for n in names if n.startswith("diff_")]
    assert len(lags) == 36
    assert len(rolls) == 18
    assert len(diffs) == 12


def test_one_pass_metrics_match_mllib_evaluator(tiny_panel):
    """M7 parity: regression_metrics (one aggregation) must agree with
    MLlib RegressionEvaluator (one scan per metric)."""
    feats, cols = build_features(
        tiny_panel, daily_lags=(1, 2), cycle_lags=(), weekday_lags=(1,),
        rolling_windows=(3,), weekday_windows=(), rolling_stats=("mean",),
    )
    train = feats.filter(F.col("ds") <= "2024-01-14")
    test = feats.filter(F.col("ds") > "2024-01-14")
    pipe = feature_pipeline(["country"], cols)
    _, train_p, test_p = prepare_features(pipe, train, test)
    res = train_and_eval("lr", train_p, test_p, lr_preset("qty"))
    ours = res.metrics
    theirs = mllib_metrics(res.predictions, "qty")
    for m in ("mae", "rmse", "r2"):
        assert math.isclose(ours[m], theirs[m], rel_tol=1e-9), (m, ours, theirs)


def test_lr_coefficients_ranked(tiny_panel):
    """M8: coefficient introspection returns (feature, coef) ranked by
    |coef| with the intercept appended."""
    feats, cols = build_features(
        tiny_panel, daily_lags=(1,), cycle_lags=(), weekday_lags=(),
        rolling_windows=(3,), weekday_windows=(), rolling_stats=("mean",),
    )
    train = feats.filter(F.col("ds") <= "2024-01-14")
    test = feats.filter(F.col("ds") > "2024-01-14")
    fp, train_p, _ = prepare_features(feature_pipeline(["country"], cols), train, test)
    model = lr_preset("qty", reg_param=0.0).fit(train_p)
    ranked = lr_coefficients(fp, model)
    assert ranked[-1][0] == "__intercept__"
    coefs = [abs(c) for _, c in ranked[:-1]]
    assert coefs == sorted(coefs, reverse=True)
    assert {n for n, _ in ranked[:-1]} == {"country_idx", *cols}


def test_tree_presets_fit(tiny_panel):
    """M3/M5: RF and GBT presets train and predict with the reference's
    configs (maxBins reduced to fixture cardinality)."""
    feats, cols = build_features(
        tiny_panel, daily_lags=(1,), cycle_lags=(), weekday_lags=(),
        rolling_windows=(3,), weekday_windows=(), rolling_stats=("mean",),
    )
    train = feats.filter(F.col("ds") <= "2024-01-14")
    test = feats.filter(F.col("ds") > "2024-01-14")
    pipe = feature_pipeline(["country"], cols)
    _, train_p, test_p = prepare_features(pipe, train, test)
    for preset in (rf_preset("qty", max_bins=32), gbt_preset("qty", max_bins=32, max_iter=5)):
        res = train_and_eval(type(preset).__name__, train_p, test_p, preset)
        assert res.predictions.count() == test_p.count()
        assert math.isfinite(res.metrics["mae"])


def test_segmented_fit_recombines(tiny_panel):
    """M9: per-segment fit covers every test row exactly once after the
    unionByName recombine, with per-segment metrics."""
    feats, cols = build_features(
        tiny_panel, daily_lags=(1,), cycle_lags=(), weekday_lags=(),
        rolling_windows=(3,), weekday_windows=(), rolling_stats=("mean",),
    )
    train = feats.filter(F.col("ds") <= "2024-01-14")
    test = feats.filter(F.col("ds") > "2024-01-14")
    preds, metrics = fit_per_segment(
        train,
        test,
        segments={"uk": F.col("country") == "UK", "other": F.col("country") != "UK"},
        pipeline_factory=lambda: feature_pipeline(["country"], cols),
        model_factory=lambda: lr_preset("qty"),
    )
    assert preds.count() == test.count()
    assert set(metrics) == {"uk", "other"}
    assert all(math.isfinite(m["mae"]) for m in metrics.values())


def test_forecast_lr_full_preset(spark):
    """The full 73-feature preset (forecast_lr_full) runs end-to-end
    through fit/predict: same test rows as the reduced preset, and its
    MAE stays within 2% of the reduced preset's. (On real retail data
    the extra lags strictly help — nb cell 30 vs 32, and the golden
    fixture asserts full-preset-beats-baseline — but testdata quantities
    are temporally random, so the extra lags carry no signal here and
    Lasso shrinks them toward zero; "doesn't hurt" is the invariant
    that transfers.)"""
    from sales_forecast_pyspark_spark.plans.queries import QUERIES

    full = QUERIES["forecast_lr_full"].builder(spark, SF_SMALL)
    red = QUERIES["forecast_lr"].builder(spark, SF_SMALL)
    mae = lambda df: df.agg(F.avg(F.abs(F.col("pred_qty") - F.col("qty")))).first()[0]  # noqa: E731
    assert full.count() == red.count() > 0
    assert mae(full) <= mae(red) * 1.02


def test_forecast_lr_query_stable_across_runs(spark):
    """The registered flagship ML query must produce identical row counts
    and near-identical metrics on repeated runs (seeded/deterministic)."""
    from sales_forecast_pyspark_spark.plans.queries import QUERIES

    q = QUERIES["forecast_lr"].builder
    a = q(spark, SF_SMALL)
    b = q(spark, SF_SMALL)
    ca, cb = a.count(), b.count()
    assert ca == cb and ca > 0
    ma = a.agg(F.avg(F.abs(F.col("pred_qty") - F.col("qty")))).first()[0]
    mb = b.agg(F.avg(F.abs(F.col("pred_qty") - F.col("qty")))).first()[0]
    assert math.isfinite(ma)
    assert math.isclose(ma, mb, rel_tol=1e-6)


def test_cap_categories_folds_tail_with_train_mapping(spark):
    """cap_categories: keep-set from TRAIN frequency only (ties broken
    by value), tail folds to __other__ in both splits — the bounded-
    maxBins prerequisite for tree models on high-cardinality columns."""
    from sales_forecast_pyspark_spark.forecast.features import cap_categories

    train = spark.createDataFrame(
        [("A",)] * 3 + [("B",)] * 2 + [("C",)] * 2 + [("D",)],
        "stock string",
    )
    test = spark.createDataFrame([("A",), ("C",), ("ZZZ",)], "stock string")
    train_c, test_c = cap_categories(train, test, "stock", top_k=2)
    # top 2 by (count desc, value): A(3), B(2) — C loses the tie to B.
    assert sorted(r["stock"] for r in train_c.collect()) == [
        "A", "A", "A", "B", "B", "__other__", "__other__", "__other__",
    ]
    # test uses the TRAIN keep-set: C and unseen ZZZ both fold.
    assert sorted(r["stock"] for r in test_c.collect()) == [
        "A", "__other__", "__other__",
    ]


def test_cap_categories_numeric_key_keeps_schema(spark):
    """Numeric surrogate keys fold to -1 (cast to the column type), so
    the schema is unchanged and downstream indexers see one column."""
    from sales_forecast_pyspark_spark.forecast.features import cap_categories

    train = spark.createDataFrame([(7,)] * 2 + [(9,)], "stock bigint")
    test = spark.createDataFrame([(7,), (1234,)], "stock bigint")
    train_c, test_c = cap_categories(train, test, "stock", top_k=1)
    assert dict(train_c.dtypes)["stock"] == "bigint"
    assert sorted(r["stock"] for r in train_c.collect()) == [-1, 7, 7]
    assert sorted(r["stock"] for r in test_c.collect()) == [-1, 7]


def test_rolling_origin_backtest_folds_and_determinism(spark):
    """Walk-forward backtest: one row per fold, training sets grow
    monotonically with the origin, metrics are finite, and a rerun
    reproduces identical rows (seeded fits, refit-per-fold pipeline)."""
    import math

    from sales_forecast_pyspark_spark.plans.queries import QUERIES
    from tests.conftest import SF_SMALL

    b = QUERIES["backtest_lr"].builder
    rows = [tuple(r) for r in b(spark, SF_SMALL).collect()]
    assert len(rows) == 3
    n_train = [r[3] for r in rows]
    assert n_train == sorted(n_train)
    for r in rows:
        assert r[4] > 0  # non-empty test window
        assert all(math.isfinite(x) for x in r[5:8])
    assert [tuple(r) for r in b(spark, SF_SMALL).collect()] == rows
