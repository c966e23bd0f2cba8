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


def test_variant_path_matches_declared_schema(spark):
    """Spark 4 VariantType (schema-less semi-structured path): parsing
    props once into a variant and extracting '$.k' typed must agree
    with the declared-schema from_json extraction events_json_extract
    uses — same ints, same nulls on malformed payloads."""
    from pyspark.sql import functions as F
    from sales_forecast_pyspark_spark.sources.readers import read_table

    ev = read_table(spark, SF_SMALL, "events").limit(500)
    both = ev.select(
        F.from_json(F.col("props"), "k INT").getField("k").alias("declared"),
        F.variant_get(F.try_parse_json("props"), "$.k", "int").alias("variant"),
    )
    assert both.filter(
        ~F.col("declared").eqNullSafe(F.col("variant"))
    ).count() == 0
