"""Every registered query with an oracle must match DuckDB at sf0.001
(fast) — the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from sales_forecast_pyspark_spark.plans.queries import QUERIES

from tests.conftest import SF_SMALL, register_duck_views
from tests.oracle_harness import compare_query

ORACLE_QUERIES = [name for name, q in QUERIES.items() if q.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    register_duck_views(duck, SF_SMALL)
    q = QUERIES[name]
    ok, msg = compare_query(q.builder(spark, SF_SMALL), duck, q.oracle)
    assert ok, f"{name}: {msg}"


def test_all_queries_runnable(spark):
    for name, q in QUERIES.items():
        df = q.builder(spark, SF_SMALL)
        assert df.count() >= 0, name
