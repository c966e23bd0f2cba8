"""Re-export shim: the deterministic Online-Retail-shaped fixture and
reference-parity pipeline moved into the package
(``sales_forecast_pyspark_spark/forecast/golden.py``) in r08 so the
registered ``model_quality_audit`` driver query and the golden-number
pytest suite share ONE source of truth. Test modules keep importing
from here."""

from __future__ import annotations

from sales_forecast_pyspark_spark.forecast.golden import (  # noqa: F401
    COUNTRIES,
    N_DAYS,
    SPLIT,
    START,
    STOCKS,
    parity_daily_sales,
    raw_retail,
    raw_retail_rows,
)
