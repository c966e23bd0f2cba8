from sales_forecast_pyspark_spark.operators.aggregates import (
    daily_rollup,
    profile_agg,
    top_k,
)
from sales_forecast_pyspark_spark.operators.rowops import (
    dedup_exact,
    deterministic_sample,
    null_repair,
    time_split,
)
from sales_forecast_pyspark_spark.operators.setops import union_by_name
from sales_forecast_pyspark_spark.operators.windows import (
    add_lags,
    add_momentum,
    add_rolling,
    ma_baseline,
)

__all__ = [
    "daily_rollup",
    "profile_agg",
    "top_k",
    "dedup_exact",
    "deterministic_sample",
    "null_repair",
    "time_split",
    "union_by_name",
    "add_lags",
    "add_momentum",
    "add_rolling",
    "ma_baseline",
]
