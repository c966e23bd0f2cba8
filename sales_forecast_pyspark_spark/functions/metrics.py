"""Forecast-error expressions and one-pass regression metrics.

The reference computes per-row error columns (err / abs_err / APE,
Sales_forecast_pyspark.py:1336-1345) then averages them into KPI tables
(:1347-1375), and separately calls RegressionEvaluator once per metric —
three full scans (:451-471). The engine keeps the per-row semantics
(including the MAPE-divides-by-nonpositive-actual wart, preserved
deliberately — SURVEY.md §7 risk list) but computes all evaluator
metrics in ONE aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_error_columns(
    df: DataFrame,
    actual: str,
    predicted: str,
    prefix: str = "",
) -> DataFrame:
    """Add err / abs_err / ape columns (Sales_forecast_pyspark.py:1336-1345).

    APE divides by the actual value, which can be <= 0 in net-quantity
    data; the reference lets negative ratios flow into the averages
    (negative MAPEs visible in its outputs). We keep that semantic but
    null out exact-zero denominators so Spark and ANSI SQL agree.
    """
    a, p = F.col(actual), F.col(predicted)
    return df.select(
        "*",
        (p - a).alias(f"{prefix}err"),
        F.abs(p - a).alias(f"{prefix}abs_err"),
        (F.abs(p - a) / F.nullif(a, F.lit(0))).alias(f"{prefix}ape"),
    )


def regression_metrics(df: DataFrame, label: str, prediction: str) -> dict[str, float]:
    """mae / rmse / r2 in a single aggregation job (vs the reference's
    one-scan-per-metric RegressionEvaluator calls, py:451-471).

    R² matches MLlib's RegressionEvaluator definition:
    ``1 - SS_res / SS_tot``. SS_tot comes from ``var_pop(y) * n`` —
    Spark's variance uses a numerically stable central-moment merge, so
    this avoids the catastrophic cancellation of the naive
    ``sum(y²) − (Σy)²/n`` form when labels have a large mean relative to
    their variance.
    """
    y, p = F.col(label), F.col(prediction)
    row = df.agg(
        F.avg(F.abs(p - y)).alias("mae"),
        F.sqrt(F.avg((p - y) * (p - y))).alias("rmse"),
        F.sum((p - y) * (p - y)).alias("ss_res"),
        F.var_pop(y).alias("var_y"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    n = row["n"]
    ss_tot = (row["var_y"] * n) if n and row["var_y"] is not None else float("nan")
    r2 = 1.0 - row["ss_res"] / ss_tot if ss_tot else float("nan")
    return {"mae": row["mae"], "rmse": row["rmse"], "r2": r2, "n": n}
