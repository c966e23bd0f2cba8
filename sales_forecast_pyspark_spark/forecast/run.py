"""Train/evaluate orchestration: fit-features-once (M6), the
train_and_eval "stored procedure" (py:1487-1529), and segmented
per-predicate fitting (M9, py:1464-1533).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.ml import Pipeline, PipelineModel
from pyspark.sql import Column, DataFrame

from sales_forecast_pyspark_spark.functions.metrics import regression_metrics
from sales_forecast_pyspark_spark.operators.setops import union_by_name


@dataclass
class ForecastResult:
    name: str
    model: object
    predictions: DataFrame
    metrics: dict[str, float]


def prepare_features(
    pipeline: Pipeline, train: DataFrame, test: DataFrame
) -> tuple[PipelineModel, DataFrame, DataFrame]:
    """M6's fit-features-once idiom (py:1084-1087): fit the feature
    pipeline on TRAIN only (indexer label maps must not see test
    categories), transform both splits, reuse for every model."""
    fitted = pipeline.fit(train)
    return fitted, fitted.transform(train), fitted.transform(test)


def train_and_eval(
    name: str,
    train_prepared: DataFrame,
    test_prepared: DataFrame,
    model,
    label: str = "qty",
) -> ForecastResult:
    """The reference's train_and_eval_lr helper generalized to any
    regressor (py:1487-1529): fit on prepared train, predict prepared
    test, compute mae/rmse/r2 in one aggregation pass."""
    fitted = model.fit(train_prepared)
    predictions = fitted.transform(test_prepared)
    metrics = regression_metrics(predictions, label, "prediction")
    return ForecastResult(name, fitted, predictions, metrics)


def fit_per_segment(
    train: DataFrame,
    test: DataFrame,
    segments: dict[str, Column],
    pipeline_factory: Callable[[], Pipeline],
    model_factory: Callable[[], object],
    label: str = "qty",
) -> tuple[DataFrame, dict[str, dict[str, float]]]:
    """M9 (py:1464-1533): split by predicate, fit a FRESH feature
    pipeline + model per segment (each segment gets its own indexer label
    maps and coefficients), then unionByName the prediction tables back
    together (py:1594, :1875).

    Returns (recombined predictions with a ``segment`` column,
    {segment: metrics}).
    """
    from pyspark.sql import functions as F

    preds = []
    all_metrics: dict[str, dict[str, float]] = {}
    for seg_name, cond in segments.items():
        seg_train = train.filter(cond)
        seg_test = test.filter(cond)
        _, train_p, test_p = prepare_features(pipeline_factory(), seg_train, seg_test)
        res = train_and_eval(seg_name, train_p, test_p, model_factory(), label)
        preds.append(
            res.predictions.select(
                F.lit(seg_name).alias("segment"),
                "country", "stock", "ds", label, "prediction",
            )
        )
        all_metrics[seg_name] = res.metrics
    return union_by_name(*preds), all_metrics
