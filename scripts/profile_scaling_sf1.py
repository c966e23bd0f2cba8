"""Heavy-query parallel-scaling probe at sf1-equivalent volume
(VERDICT r15 ask #7): at sf0.1 the board is overhead-bound — the 8c/32c
ratio reads ~1 everywhere because the median query is ~1 s and
job-scheduling fixed costs dominate — so scale evidence needs inputs
big enough for compute to dominate. This runs the compute-bound heavies
against a 10×-of-sf0.1 rehearsal directory (regenerate per session:
``python scripts/scale_rehearsal.py gen --k 10 --out .rehearsal/sf1x``)
at the core count in ``$SPARK_GRAFT_CPUS``, timing each query's noop
sink twice (cold, warm). Run once at 32 and once at 8 and compare.

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/profile_scaling_sf1.py [--dir .rehearsal/sf1x]
Prints one JSON line {"cpus": N, "times": {q: [cold_s, warm_s]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVIES = [
    "pricing_summary",
    "forecast_lr",
    "tfidf_similar_docs",
    "near_dedup_minhash",
    "pagerank_parts",
    "copurchase_triangles",
    "rolling_stats",
    "country_rollup",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".rehearsal/sf1x")
    ap.add_argument("--queries", nargs="*", default=HEAVIES)
    args = ap.parse_args()

    from sales_forecast_pyspark_spark.plans.queries import QUERIES
    from sales_forecast_pyspark_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = get_spark("profile-scaling-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"cpus": cpus, "dir": args.dir, "times": {}}
    for name in args.queries:
        q = QUERIES[name]
        times = []
        for rep in ("cold", "warm"):
            spark.sparkContext.setJobDescription(f"{name} {rep} x{cpus}")
            t0 = time.time()
            df = q.builder(spark, args.dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
        out["times"][name] = times
        spark.catalog.clearCache()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
