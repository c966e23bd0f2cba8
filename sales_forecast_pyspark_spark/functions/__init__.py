from sales_forecast_pyspark_spark.functions.calendar import with_calendar_columns
from sales_forecast_pyspark_spark.functions.metrics import (
    regression_metrics,
    with_error_columns,
)
from sales_forecast_pyspark_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "with_calendar_columns",
    "regression_metrics",
    "with_error_columns",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
