"""MLlib forecasting pipelines (reference operators M1-M10, SURVEY.md §2.11)."""

from sales_forecast_pyspark_spark.forecast.evaluate import (
    lr_coefficients,
    mllib_metrics,
)
from sales_forecast_pyspark_spark.forecast.features import build_features, with_log1p
from sales_forecast_pyspark_spark.forecast.pipelines import (
    feature_pipeline,
    gbt_preset,
    lr_preset,
    materialize,
    rf_preset,
)
from sales_forecast_pyspark_spark.forecast.run import (
    ForecastResult,
    fit_per_segment,
    prepare_features,
    train_and_eval,
)

__all__ = [
    "ForecastResult",
    "build_features",
    "feature_pipeline",
    "fit_per_segment",
    "gbt_preset",
    "lr_coefficients",
    "lr_preset",
    "materialize",
    "mllib_metrics",
    "prepare_features",
    "rf_preset",
    "train_and_eval",
    "with_log1p",
]
