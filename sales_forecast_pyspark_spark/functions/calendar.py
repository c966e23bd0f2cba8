"""Calendar feature extraction (reference operator P2,
Sales_forecast_pyspark.py:107-114).

Semantics to preserve exactly (SURVEY.md §1.3): Spark ``dayofweek`` is
1=Sunday..7=Saturday; ``weekofyear`` is ISO week. These feed both the
feature set and the weekday-partitioned windows, so any deviation changes
every downstream lag/rolling value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CALENDAR_COLUMNS = ("year", "month", "week", "day", "dow")


def calendar_exprs(date_col: str | Column) -> dict[str, Column]:
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return {
        "year": F.year(c),
        "month": F.month(c),
        "week": F.weekofyear(c),
        "day": F.dayofmonth(c),
        "dow": F.dayofweek(c),  # 1=Sunday .. 7=Saturday (Spark semantics)
    }


def with_calendar_columns(df: DataFrame, date_col: str = "ds") -> DataFrame:
    """Add year/month/week/day/dow in one batched projection (the
    reference's batched-select idiom, Sales_forecast_pyspark.py:611-647 —
    one Project node instead of five chained withColumns)."""
    exprs = calendar_exprs(date_col)
    return df.select("*", *[expr.alias(name) for name, expr in exprs.items()])
