"""Shared fixtures: one session-scoped SparkSession + a DuckDB connection
with the testdata views registered (mirroring the driver's oracle setup).
"""

from __future__ import annotations

import duckdb
import pytest

from sales_forecast_pyspark_spark.session import get_spark
from sales_forecast_pyspark_spark.sources.readers import TESTDATA_TABLES

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="tests",
        **{"spark.sql.shuffle.partitions": "8", "spark.driver.memory": "8g"},
    )
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    yield con


def register_duck_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
