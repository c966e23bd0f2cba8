"""One-call maintenance for the persisted stores — the operator entry
point over the r13 policy surface (VERDICT r12 asks #3/#4):

    python scripts/store_maintenance.py PATH --kind {index,minhash}
        [--max-inc-batches 16] [--max-inc-bytes BYTES]
        [--target-file-mb 128] [--dry-run]

Consults ``lsm.should_compact`` over the store's tables and runs the
matching compactor when the increments tier is past threshold (both
compactors hold the single-maintainer lease — a concurrent ingest or a
second maintenance run fails loudly with LeaseHeldError, exit 3, never
corrupts). Each store's rebuild-class verdict rides along: the index
evaluates ``should_rebuild`` (the O(batches) drift verdict), the
MinHash store ``should_rescale_bands`` (screening-load densification)
— so one cron line covers every maintenance decision. A rebuild is
REPORTED, never auto-run — it retrains quantizers / rewrites the
banding geometry and must go to a fresh path with a serving-pointer
flip, an operator decision by design.

Prints one JSON line:
    {"kind": ..., "path": ..., "compact_due": bool, "compacted": bool,
     "files": {table: [before, after]} | null,
     "rebuild": {verdict dict} | null,
     "recommended_n_probe": {recommend_n_probe dict} | null}

``recommended_n_probe`` (index kind only, VERDICT r13 ask #5): the
measured IO/recall dial — the smallest n_probe whose pooled recall@k
over a bounded stored-vector sample meets ``--recall-target`` (default
0.9). Report-only, like rebuild: serving configs change by operator
decision. ``--no-tune`` skips it (it costs |sample| brute-force + a
probe ladder, heavier than the kilobyte verdicts).

Exit codes: 0 = healthy (nothing due, or fold done and no rebuild
signal), 2 = rebuild signalled (monitoring-friendly), 3 = lease held.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = {
    "index": ["codes", "vectors", "stats_live"],
    "minhash": ["signatures", "buckets", "fingerprints", "doc_counts"],
}


def maintain(
    spark,
    path: str,
    kind: str,
    max_inc_batches: int = 16,
    max_inc_bytes: int | None = None,
    target_file_mb: int = 128,
    dry_run: bool = False,
    tune_n_probe: bool = True,
    recall_target: float = 0.9,
) -> dict:
    from sales_forecast_pyspark_spark.llmdata import (
        compact_ivfpq_index,
        compact_minhash_store,
        lsm,
        recommend_n_probe,
        should_rebuild,
        should_rescale_bands,
    )

    due = lsm.should_compact(
        spark,
        path,
        TABLES[kind],
        max_inc_batches=max_inc_batches,
        max_inc_bytes=max_inc_bytes,
    )
    out: dict = {
        "kind": kind,
        "path": path,
        "compact_due": bool(due),
        "compacted": False,
        "files": None,
        "rebuild": None,
    }
    if due and not dry_run:
        compactor = (
            compact_ivfpq_index if kind == "index" else compact_minhash_store
        )
        out["files"] = {
            t: list(c)
            for t, c in compactor(
                spark, path, target_file_mb=target_file_mb
            ).items()
        }
        out["compacted"] = True
    # each store's rebuild-class verdict rides along: drift for the
    # index, screening-load densification for the MinHash store — both
    # REPORTED, never auto-run (rebuilds retrain state and belong on a
    # fresh path with a serving-pointer flip)
    if kind == "index":
        out["rebuild"] = should_rebuild(spark, path)
        # the serving IO/recall dial rides the same cron line (VERDICT
        # r13 ask #5) — report-only, the operator flips serving configs
        out["recommended_n_probe"] = (
            recommend_n_probe(spark, path, recall_target=recall_target)
            if tune_n_probe
            else None
        )
    else:
        out["rebuild"] = should_rescale_bands(spark, path)
        out["recommended_n_probe"] = None
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--kind", choices=list(TABLES), required=True)
    ap.add_argument("--max-inc-batches", type=int, default=16)
    ap.add_argument("--max-inc-bytes", type=int, default=None)
    ap.add_argument("--target-file-mb", type=int, default=128)
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--no-tune", action="store_true")
    ap.add_argument("--recall-target", type=float, default=0.9)
    args = ap.parse_args()

    from sales_forecast_pyspark_spark.llmdata import lsm
    from sales_forecast_pyspark_spark.session import get_spark

    spark = get_spark("store-maintenance")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        out = maintain(
            spark,
            args.path,
            args.kind,
            max_inc_batches=args.max_inc_batches,
            max_inc_bytes=args.max_inc_bytes,
            target_file_mb=args.target_file_mb,
            dry_run=args.dry_run,
            tune_n_probe=not args.no_tune,
            recall_target=args.recall_target,
        )
    except lsm.LeaseHeldError as e:
        print(json.dumps({"error": "lease_held", "detail": str(e)}))
        return 3
    print(json.dumps(out), flush=True)
    r = out["rebuild"] or {}
    return 2 if (r.get("rebuild") or r.get("rescale")) else 0


if __name__ == "__main__":
    raise SystemExit(main())
