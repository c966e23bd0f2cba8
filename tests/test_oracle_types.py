"""Static type audit of EVERY oracle SQL string against the driver's
typed-hash contract — no Spark session needed.

The driver canonicalizes and hashes TYPED values, so an oracle whose
DuckDB output type differs from the Spark output type records
``hash_match: false`` even when every value is identical. Round 4 shipped
three such rows (``events_json_extract``, ``key_skew_profile``,
``boilerplate_chunk_stats``), all from DuckDB widening bare ``SUM()``
over integers to HUGEINT (int128). DuckDB's ``DESCRIBE <query>`` binds
the full output schema without executing, so this audit covers the whole
registry in seconds at sf0.001.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as entry
from sales_forecast_pyspark_spark.sources.readers import TESTDATA_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TYPE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _oracle_items():
    return sorted(entry.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_output_types_driver_hashable(duck, name, sql):
    rows = duck.execute(f"DESCRIBE {sql}").fetchall()
    offenders = [
        (col, typ)
        for col, typ, *_ in rows
        if "HUGEINT" in str(typ).upper()
    ]
    assert not offenders, (
        f"{name}: oracle SQL produces HUGEINT column(s) {offenders}; "
        "wrap in CAST(... AS BIGINT) so the driver's typed hasher matches "
        "Spark's bigint"
    )
