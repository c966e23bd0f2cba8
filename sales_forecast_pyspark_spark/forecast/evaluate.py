"""Model evaluation and introspection (M7, M8).

``regression_metrics`` (functions/metrics.py) is the engine's one-pass
evaluator; ``mllib_metrics`` wraps MLlib's RegressionEvaluator with the
reference's one-scan-per-metric shape (py:451-471) for parity testing.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import LinearRegressionModel
from pyspark.sql import DataFrame


def mllib_metrics(
    predictions: DataFrame,
    label: str,
    prediction_col: str = "prediction",
    metrics: tuple[str, ...] = ("mae", "rmse", "r2"),
) -> dict[str, float]:
    """M7 (py:451-471): RegressionEvaluator, one evaluate() per metric —
    one full scan each, exactly as the reference does. Use
    ``functions.metrics.regression_metrics`` for the single-pass variant;
    the two are parity-tested against each other."""
    from pyspark.ml.evaluation import RegressionEvaluator

    out = {}
    for m in metrics:
        ev = RegressionEvaluator(
            labelCol=label, predictionCol=prediction_col, metricName=m
        )
        out[m] = ev.evaluate(predictions)
    return out


def lr_coefficients(
    features_model: PipelineModel, lr_model: LinearRegressionModel
) -> list[tuple[str, float]]:
    """M8 (py:1992-2016): locate the VectorAssembler stage by isinstance
    scan, zip its input column names with the LR coefficient vector, and
    rank by |coefficient| descending. Returns [(feature, coef), ...] with
    the intercept appended last as ("__intercept__", b)."""
    assembler = next(
        s for s in features_model.stages if isinstance(s, VectorAssembler)
    )
    names = list(assembler.getInputCols())
    coefs = lr_model.coefficients.toArray().tolist()
    ranked = sorted(zip(names, coefs), key=lambda t: abs(t[1]), reverse=True)
    return ranked + [("__intercept__", float(lr_model.intercept))]
