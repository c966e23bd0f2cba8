"""Count the Spark jobs (and their wall) one versioned
``append_to_ivfpq_index`` / ``append_to_minhash_store`` issues — the
measurement behind VERDICT r15 ask #4 (thin the per-append job count
only if fixed per-job overhead dominates a production batch cadence).

Job COUNT is deterministic (window-independent); the per-stage walls
carry the usual shared-host caveat. Prints one JSON line.

Usage:
    python scripts/profile_append_jobs.py [--dir .rehearsal/sf1x]
        [--batch-rows 12500]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".rehearsal/sf1x")
    ap.add_argument("--batch-rows", type=int, default=12_500)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sales_forecast_pyspark_spark.llmdata.ann_index import (
        append_to_ivfpq_index,
        build_ivfpq_index,
    )
    from sales_forecast_pyspark_spark.llmdata.dedup_store import (
        append_to_minhash_store,
        build_minhash_store,
    )
    from sales_forecast_pyspark_spark.session import get_spark

    spark = get_spark("profile-append-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    emb = spark.read.parquet(
        os.path.join(args.dir, "embeddings.parquet")
    ).select("vec_id", "embedding")
    batch = (
        emb.orderBy("vec_id")
        .limit(args.batch_rows)
        .select((-F.col("vec_id") - 1).alias("vec_id"), "embedding")
        .localCheckpoint(eager=True)
    )
    docs = spark.read.parquet(os.path.join(args.dir, "documents.parquet"))
    tbatch = (
        docs.orderBy("doc_id")
        .limit(args.batch_rows)
        .select((-F.col("doc_id") - 1).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )

    tmp = tempfile.mkdtemp(prefix="profile_append_jobs_")
    idx = os.path.join(tmp, "idx")
    mh = os.path.join(tmp, "mh")
    build_ivfpq_index(emb, idx)
    build_minhash_store(docs, mh)

    out = {"dir": args.dir, "n_batch": args.batch_rows}
    for name, fn in (
        ("ivfpq_append", lambda b: append_to_ivfpq_index(batch, idx, batch_id=b)),
        ("minhash_append", lambda b: append_to_minhash_store(tbatch, mh, batch_id=b)),
    ):
        # batch 1 warms code paths; batch 2 is the measured cadence point
        fn(1)
        spark.sparkContext.setJobGroup(name, name)
        before = set(tracker.getJobIdsForGroup(name))
        t0 = time.time()
        fn(2)
        wall = time.time() - t0
        jobs = [j for j in tracker.getJobIdsForGroup(name) if j not in before]
        spark.sparkContext.setJobGroup(None, None)
        out[f"{name}_jobs"] = len(jobs)
        out[f"{name}_wall_s"] = round(wall, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
