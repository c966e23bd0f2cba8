"""Run the driver's DuckDB-oracle comparison for every registered query
at a given scale-factor directory (default sf0.01; pass sf0.1 to re-verify
the bigger sweep recorded in COVERAGE.md).

Usage: python scripts/oracle_sweep.py [/root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import duckdb

import __spark_entry__ as entry
from oracle_harness import compare_query
from sales_forecast_pyspark_spark.session import get_spark
from sales_forecast_pyspark_spark.sources.readers import TESTDATA_TABLES


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-sweep")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        if name not in oracles:
            n = df.count()
            print(f"{name:28s} rows-only  {n:>8d} rows  {time.time()-t0:5.1f}s")
            continue
        ok, msg = compare_query(df, con, oracles[name])
        status = "OK " if ok else "FAIL"
        print(f"{name:28s} {status}  {time.time()-t0:5.1f}s  {msg}")
        if not ok:
            failures.append(name)
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
