from sales_forecast_pyspark_spark.plans.panel import daily_panel, PANEL_CTE
from sales_forecast_pyspark_spark.plans.queries import QUERIES, oracle_sql, queries

__all__ = ["daily_panel", "PANEL_CTE", "QUERIES", "oracle_sql", "queries"]
