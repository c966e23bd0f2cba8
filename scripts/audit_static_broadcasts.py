"""Registry-wide static-broadcast audit: flag BroadcastExchange nodes
fed by an exploded (Generate) subtree in each registered query's STATIC
physical plan at a large corpus directory.

The bug class (caught by the r09 100x dedup rehearsal, fixed in
`llmdata/dedup.py::_jaccard_on_pairs`): Catalyst's static size
estimates do not model explode fan-out, so a frame behind a
posexplode can look broadcast-able while its true size is GBs — and
AQE cannot demote a statically planned BroadcastExchange (only
shuffle stages are re-measured at runtime), so the plan OOMs the
moment the corpus outgrows the estimate. This sweep is plan-only
(no execution): it builds every registered query against the given
scale dir and tree-walks the static plan, flagging any
BroadcastExchange whose subtree contains a Generate. Run it after
adding an operator that joins exploded data:

    python scripts/audit_static_broadcasts.py [.rehearsal/sf10x]

Expected output: FLAGGED: [] (r09 baseline, all 150 queries clean).
ML-fit/driver-assembly queries that run jobs at plan-build time are
skipped (same policy as scripts/audit_plans.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_forecast_pyspark_spark.session import get_spark  # noqa: E402

# Queries that fit models / assemble driver-side rows at plan-build
# time — building their "plan" runs jobs (same skip list as
# scripts/audit_plans.py, plus the LSH-fit pair miner).
SKIP = {
    "ann_ivf_topk", "ann_ivfpq_topk", "ann_pq_topk", "backtest_lr",
    "dedup_clusters", "forecast_eval_kpi", "forecast_gbt", "forecast_lr",
    "forecast_lr_full", "forecast_rf", "forecast_segmented",
    "leakage_free_split", "lr_coefficients_top", "model_quality_audit",
    "near_dedup_survivors", "ann_pairs_topk",
}


def _subtree_has_generate(node) -> bool:
    if node.getClass().getSimpleName().startswith("Generate"):
        return True
    it = node.children().iterator()
    while it.hasNext():
        if _subtree_has_generate(it.next()):
            return True
    return False


def _walk(node, hits: list[str]) -> None:
    name = node.getClass().getSimpleName()
    if name == "BroadcastExchangeExec" and _subtree_has_generate(node):
        hits.append(name)
    # expression-embedded plans (scalar/DPP subqueries) are not in
    # children() — a flagged broadcast inside one must still count
    try:
        sit = node.subqueries().iterator()
        while sit.hasNext():
            _walk(sit.next(), hits)
    except Exception:
        pass
    it = node.children().iterator()
    while it.hasNext():
        _walk(it.next(), hits)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".rehearsal/sf10x"
    from sales_forecast_pyspark_spark.plans.queries import QUERIES

    spark = get_spark("static-broadcast-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flagged, errors = [], []
    for name, q in QUERIES.items():
        if name in SKIP:
            continue
        try:
            jplan = q.builder(spark, sf_dir)._jdf.queryExecution().executedPlan()
            hits: list[str] = []
            _walk(jplan, hits)
            if hits:
                flagged.append((name, len(hits)))
                print(f"FLAG {name} {len(hits)}", flush=True)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            errors.append((name, str(e)[:100]))
            print(f"ERR {name} {str(e)[:100]}", flush=True)
    print("FLAGGED:", flagged)
    if errors:
        print("ERRORS:", errors)
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
