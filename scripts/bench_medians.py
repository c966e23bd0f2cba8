"""Warm-median bench accounting for the heavy queries (VERDICT r09
ask #6 / r10 ask #6).

The per-round driver bench is a single cold-board pass — fine for the
cheap queries, but the >=5s heavies show 30-80% run-to-run swings in
board context (pricing_summary 2.08->3.17s across r09->r10 with ZERO
plan changes), which burns a triage cycle every round. This script
produces the number that is actually comparable across rounds: the
MEDIAN of 3 warm, isolated, back-to-back runs per query, after the same
sf0.01 warmup pass and shared-frontier builds bench.py uses, at the
bench SF (default sf0.1).

Per round: run this, record the medians column in BENCH_BASELINE.md's
"Warm medians" table, and judge driver-board movement against the
medians (a driver-tail mover whose warm median is flat is machine
noise by definition — stop investigating).

Usage:
    python scripts/bench_medians.py [query ...]
Defaults to HEAVIES (the r10 >=5s set + the recurring noisy movers).
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Output: one JSON line {"medians": {q: sec}, "runs": {q: [s,s,s]}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import prepare_steady_state  # noqa: E402

from sales_forecast_pyspark_spark.session import get_spark  # noqa: E402

# The r10 driver-tail >=5s queries plus the two that crossed (or
# brushed) the 1.5x flag threshold on single-pass noise in r09/r10.
HEAVIES = [
    "pagerank_parts",
    "near_dedup_minhash",
    "ann_pairs_topk",
    "tfidf_similar_docs",
    "forecast_lr",
    "ann_lsh_pairs",
    "pricing_summary",
]

RUNS = 3


def _execute(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or HEAVIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-medians")
    spark.sparkContext.setLogLevel("ERROR")

    from sales_forecast_pyspark_spark.plans.queries import queries

    registry = queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # THE same steady-state definition as the board — shared code, not
    # a copy (code-review r11): bench.py's prepare_steady_state runs
    # the sf0.01 warmup plans for the measured queries and caches the
    # shared frontiers at the measured SF.
    prepare_steady_state(spark, sf_dir, names)

    runs: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            _execute(registry[name](spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        runs[name] = samples
        print(f"{name:28s} {samples} median={statistics.median(samples)}",
              file=sys.stderr, flush=True)

    medians = {n: statistics.median(s) for n, s in runs.items()}
    print(json.dumps({"medians": medians, "runs": runs, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
