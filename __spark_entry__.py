"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``sales_forecast_pyspark_spark`` package;
this module is a thin adapter over its query registry
(``sales_forecast_pyspark_spark/plans/queries.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sales_forecast_pyspark_spark.plans import queries as _registry  # noqa: F401
from sales_forecast_pyspark_spark.plans.queries import oracle_sql as _oracle_sql
from sales_forecast_pyspark_spark.plans.queries import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the daily sales panel
    (lineitem ⋈ supplier ⋈ nation → (country, stock, day) rollup with
    calendar features — the reference's core A2 aggregate)."""
    from sales_forecast_pyspark_spark.plans.panel import daily_panel

    return daily_panel(spark, "/root/testdata/sf0.001", calendar=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return _oracle_sql()
