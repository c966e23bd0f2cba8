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


@pytest.mark.slow
def test_all_queries_runnable(spark):
    for name, q in QUERIES.items():
        df = q.builder(spark, SF_SMALL)
        assert df.count() >= 0, name


def test_retired_big_ticket_orders_still_matches_oracle(spark, duck):
    """`big_ticket_orders` was retired from the driver registry in r13
    (slot spent on `minhash_store_lifecycle`, per SCALING.md's ranked
    policy); the retirement contract keeps its FULL oracle comparison
    alive here — same builder, same SQL, same compare — so the Q18
    shape's evidence is pytest-level instead of driver-level."""
    from sales_forecast_pyspark_spark.plans.queries import (
        BIG_TICKET_ORDERS_ORACLE,
        q_big_ticket_orders,
    )

    register_duck_views(duck, SF_SMALL)
    ok, msg = compare_query(
        q_big_ticket_orders(spark, SF_SMALL), duck, BIG_TICKET_ORDERS_ORACLE
    )
    assert ok, msg


def test_retired_nation_trade_volume_still_matches_oracle(spark, duck):
    """`nation_trade_volume` was retired from the driver registry in
    r14 (slot spent on `semantic_dedup_lifecycle`, per SCALING.md's
    ranked policy); the retirement contract keeps its FULL oracle
    comparison alive here — same builder, same SQL, same compare — so
    the Q7 double-role-nation shape's evidence is pytest-level instead
    of driver-level."""
    from sales_forecast_pyspark_spark.plans.queries import (
        NATION_TRADE_VOLUME_ORACLE,
        q_nation_trade_volume,
    )

    register_duck_views(duck, SF_SMALL)
    ok, msg = compare_query(
        q_nation_trade_volume(spark, SF_SMALL), duck, NATION_TRADE_VOLUME_ORACLE
    )
    assert ok, msg


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


def test_waiting_suppliers_rewrite_matches_textbook_quantifiers(duck):
    """The registered waiting_suppliers oracle shares the Spark side's
    quantifier-elimination rewrite (rollup + per-order summary), so a
    rewrite bug would pass the oracle comparison. This test pins the
    rewrite against the TEXTBOOK correlated EXISTS / NOT EXISTS
    formulation (TPC-H Q21's shape) in DuckDB alone."""
    register_duck_views(duck, SF_SMALL)
    rewrite = duck.execute(
        """
        WITH sl AS (
          SELECT l_orderkey AS ok, l_suppkey AS sk,
                 MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                          THEN 1 ELSE 0 END) AS late
          FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          WHERE o_orderstatus = 'F' GROUP BY 1, 2),
        po AS (SELECT ok, COUNT(*) AS n_supp, SUM(late) AS n_late FROM sl GROUP BY 1)
        SELECT s_name, COUNT(*) AS numwait
        FROM sl JOIN po USING (ok) JOIN supplier ON s_suppkey = sk
        WHERE late = 1 AND n_supp > 1 AND n_late = 1
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    textbook = duck.execute(
        """
        WITH late_lines AS (
          SELECT l1.l_orderkey, l1.l_suppkey
          FROM lineitem l1 JOIN orders ON o_orderkey = l1.l_orderkey
          WHERE o_orderstatus = 'F'
            AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          GROUP BY 1, 2)
        SELECT s_name, COUNT(*) AS numwait
        FROM late_lines w JOIN supplier ON s_suppkey = w.l_suppkey
        WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = w.l_orderkey
              AND l2.l_suppkey <> w.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
            WHERE l3.l_orderkey = w.l_orderkey
              AND l3.l_suppkey <> w.l_suppkey
              AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert rewrite == textbook
