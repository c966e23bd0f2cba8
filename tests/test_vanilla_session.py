"""Regression guard for the driver scenario: queries must run and match
the oracle on a SparkSession the ENGINE DID NOT BUILD, on a non-UTC
host. Runs in a subprocess because timezone and session state are
process-global.

Covers the three failure classes found in round 2: nanos-parquet reading
without our session defaults, session-timezone-dependent date casts, and
client-local-timezone timestamp collection.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = """
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master('local[4]')
         .config('spark.sql.shuffle.partitions','4')
         .config('spark.ui.enabled','false')
         .getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
import duckdb
from tests.conftest import register_duck_views, SF_SMALL
from tests.oracle_harness import compare_query
from sales_forecast_pyspark_spark.plans.queries import QUERIES
con = duckdb.connect(); register_duck_views(con, SF_SMALL)
# one query per failure class: nanos scan + tz-sensitive timestamps,
# date-cast panel rollup, a windowed timestamp aggregate, and the
# as-of join's rendered-timestamp output
# r06 additions: a ts->date cast aggregate (user_streaks) and a
# floored-epoch arithmetic query (time_weighted_value) — both new
# members of the tz-sensitive class.
# scd2_merge_history renders microsecond timestamps via date_format —
# the same class as user_state_history, through the incremental path
# late-r06 additions: touch_attribution (unix_micros latency — must be
# tz-shift-invariant under subtraction) and user_daily_interp /
# order_backlog_sweep (ts->date casts through densify and the sweep)
for name in ('daily_rollup', 'events_window', 'sessionization', 'asof_last_purchase',
             'user_streaks', 'time_weighted_value', 'scd2_merge_history',
             'touch_attribution', 'user_daily_interp', 'order_backlog_sweep'):
    q = QUERIES[name]
    ok, msg = compare_query(q.builder(spark, SF_SMALL), con, q.oracle)
    assert ok, f'{name}: {msg[:200]}'
print('VANILLA-OK')
"""


def test_queries_survive_foreign_session_and_timezone():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        env={
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "HOME": "/root",
            "TZ": "America/New_York",
            "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
            "PYTHONPATH": "/root/repo",
        },
        cwd="/root/repo",
    )
    assert "VANILLA-OK" in proc.stdout, proc.stdout[-500:] + proc.stderr[-1500:]
