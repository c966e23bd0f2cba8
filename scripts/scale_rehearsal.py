"""Empirical scale rehearsal: synthesize a k-times (default 10x) copy
of the sf0.1 star schema locally, run the heaviest bench queries at
both scales in ONE session, and audit that the physical plan SHAPES
hold — the evidence VERDICT r07 item #2 asked for, since /root/testdata
stops at sf0.1 (17 MB) and every "safe at 100 TB" claim was previously
plan-read only.

Synthesis (gen): each scaled table is a union of k key-remapped copies
of the sf0.1 original. One uniform OFFSET (10M, above every key range)
keeps every foreign key consistent per copy: l_orderkey+i*OFF matches
o_orderkey+i*OFF, o_custkey+i*OFF matches c_custkey+i*OFF, and
events.user_id+i*OFF matches the remapped customer keys that
salted_segment_value joins. Dates are NOT shifted — per-day volume
grows k-fold, so date-filtered queries still see k-times rows (a
shifted calendar would let date literals silently select 1/k of the
data and undercut the rehearsal). Dimension tables (region, nation,
supplier, part) stay fixed: dims grow slower than facts in reality,
and keeping them broadcast-sized is exactly the 100 TB shape.

Text/vector decorrelation: document text is char-rotated per copy
(copy i translates a-z to the alphabet rotated by i) so cross-copy
shingles never collide — without this every doc gains k-1 exact twins
and the dedup/similarity tiers pay a quadratic-in-k candidate blowup
that no real corpus has. Embeddings get deterministic per-copy sign
flips (expected cross-copy cosine ~0) for the same reason. Within-copy
planted near-dups survive untouched, so the operators still find work.

Audit (run): for each heavy query, time the full plan through the noop
sink at sf0.1 and at the synth dir, and diff the physical join
strategies. Flags raised:
  - CARTESIAN: any CartesianProduct at the synth scale.
  - BNLJ: a BroadcastNestedLoopJoin outside the declared bounded set
    (tests/test_plan_invariants.py::BNLJ_DECLARED — 1-row summary
    crossJoins etc.).
  - BCAST_FLIP: MORE BroadcastHashJoins at the synth scale than at
    sf0.1 — the "SMJ flipped to broadcasting a side that just grew
    10x" failure mode.
  - ROLLUP_EXCHANGE: daily_rollup growing beyond its single
    hash-partitioning exchange.
  - SUPERLINEAR: wall ratio > k * 1.8 (beyond linear + noise bar).

Usage:
    python scripts/scale_rehearsal.py gen   [--k 10] [--out .rehearsal/sf1x]
    python scripts/scale_rehearsal.py run   [--out .rehearsal/sf1x] [--k 10]

The data dir is gitignored; the committed artifacts are this script
and the measured table in SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_BASE = "/root/testdata/sf0.1"

# One offset above every key range in sf0.1 (max o_orderkey 149,999;
# max event_id 99,999) keeps all per-copy key spaces disjoint AND
# foreign-key consistent with the same arithmetic.
OFFSET = 10_000_000

# key columns remapped per copy; dims absent from this map are copied
# verbatim (region, nation, supplier, part).
REMAP: dict[str, list[str]] = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
VERBATIM = ["region", "nation", "supplier", "part"]

# The heaviest r07 bench queries plus the scale-sensitive shapes the
# VERDICT called out: flagship rollup, distributed prefix sum, salted
# skew join, fact-fact SMJ, applyInPandas packing, the dedup/similarity
# tier, the graph tier, and the ML fit.
HEAVY = [
    "daily_rollup",
    "pricing_summary",
    "weekday_seasonality",
    "abc_products",
    "salted_segment_value",
    "small_order_part_revenue",
    "sessionization",
    "sequence_packs",
    "bigram_surprisal",
    "ann_lsh_pairs",
    "near_dedup_minhash",
    # r09 (VERDICT r08 #4): the third dedup decade runs the full
    # near-dup chain — banded candidates AND the label-propagation
    # clustering — so survivors' O(log n) round claim gets measured
    # evidence on a 100x-denser cluster graph, not just the pair mine.
    "near_dedup_survivors",
    "tfidf_similar_docs",
    "copurchase_triangles",
    "pagerank_parts",
    "forecast_lr",
]

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _copy_expr(df: DataFrame, table: str, i: int) -> DataFrame:
    """Copy i of a scaled table: keys offset, text/vectors decorrelated."""
    out = df
    for key in REMAP[table]:
        dtype = dict(df.dtypes)[key]
        out = out.withColumn(key, (F.col(key) + F.lit(i * OFFSET)).cast(dtype))
    if table == "documents" and i > 0:
        # Affine-cipher permutation of the alphabet, NOT a plain
        # rotation: rotation by i is the identity at i % 26 == 0, so a
        # k=30 run would leave copies 26-29 byte-identical to copy 0
        # and quietly reintroduce the quadratic cross-copy dup blowup.
        # a must be coprime to 26; (a, b) pairs are distinct for every
        # i in any realistic k, and i=0 is never routed here.
        a = [3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25][i % 11]
        perm = "".join(_ALPHA[(a * j + i) % 26] for j in range(26))
        out = out.withColumn(
            "text",
            F.translate("text", _ALPHA + _ALPHA.upper(), perm + perm.upper()),
        )
    if table == "embeddings" and i > 0:
        # deterministic pseudo-random sign flips: expected cross-copy
        # cosine ~0, so LSH/brute-force candidate structure stays
        # linear in k instead of quadratic.
        def _flip(x, j):
            sign = F.when(
                (F.floor(F.abs(F.sin(j * 1.7 + F.lit(i * 13.37))) * 1000) % 2)
                == 0,
                F.lit(-1.0),
            ).otherwise(F.lit(1.0))
            return (x * sign).cast("float")

        out = out.withColumn("embedding", F.transform("embedding", _flip))
    return out


def gen(k: int, out_dir: str) -> None:
    from sales_forecast_pyspark_spark.session import get_spark
    from sales_forecast_pyspark_spark.sources.readers import read_table

    spark = get_spark("scale-rehearsal-gen")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for table in VERBATIM:
        read_table(spark, SF_BASE, table).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )
        print(f"  {table}: verbatim")
    for table in REMAP:
        base = read_table(spark, SF_BASE, table)
        copies = [_copy_expr(base, table, i) for i in range(k)]
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        # partition count sized for the scaled volume so downstream
        # scans see realistic splits rather than k 1-file partitions
        n_parts = max(8, min(64, 4 * k))
        scaled.repartition(n_parts).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )
        n = spark.read.parquet(os.path.join(out_dir, f"{table}.parquet")).count()
        print(f"  {table}: {n} rows ({k}x)")
    print(f"wrote {out_dir}")


# physical-plan node class -> profile key
_NODE_KEYS = {
    "SortMergeJoinExec": "smj",
    "BroadcastHashJoinExec": "bhj",
    "ShuffledHashJoinExec": "shj",
    "BroadcastNestedLoopJoinExec": "bnlj",
    "CartesianProductExec": "cart",
}


def _join_profile(jplan) -> dict[str, int]:
    """Operator counts by TREE TRAVERSAL of the executed physical plan
    (py4j), not string matching. The printed tree of a finalized
    AdaptiveSparkPlan embeds a "== Final Plan ==" AND an "== Initial
    Plan ==" section — recursively, once per cached InMemoryRelation's
    own adaptive subplan — so any string-count either double/triple
    counts operators or (if truncated at the first marker) audits only
    a prefix of the plan (code-review r08, verified: tfidf's printed
    plan holds 17 nested Initial markers). Traversal resolves each
    AdaptiveSparkPlanExec to its FINAL plan, descends into query
    stages and cached-relation fill plans, and skips reused exchanges
    (their original is counted once)."""
    counts = {
        "smj": 0, "bhj": 0, "shj": 0, "bnlj": 0, "cart": 0, "exch": 0,
        # accessor failures during the walk — surfaced as an
        # AUDIT_PARTIAL flag by the caller, never silently dropped
        "skip": 0,
    }
    # one count per DISTINCT cache fill plan: the fill executes once
    # however many InMemoryTableScans read it (keyed by the plan's
    # structural hashCode — case-class semantic identity)
    seen_fills: set[int] = set()

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if name in ("ReusedExchangeExec", "ReusedSubqueryExec"):
            return  # the original exchange/subquery is counted where it lives
        if name == "InMemoryTableScanExec":
            # audit the cached relation's FILL plan too — its joins ran
            try:
                fill = node.relation().cachedPlan()
                h = fill.hashCode()
                if h not in seen_fills:
                    seen_fills.add(h)
                    walk(fill)
            except Exception:
                counts["skip"] += 1
            return
        key = _NODE_KEYS.get(name)
        if key is not None:
            counts[key] += 1
        if name == "ShuffleExchangeExec":
            try:
                part = node.outputPartitioning().getClass().getSimpleName()
            except Exception:
                part = ""
            if part == "HashPartitioning":
                counts["exch"] += 1
        # expression-embedded plans (scalar/DPP subqueries) are NOT in
        # children() — a CartesianProduct inside one would otherwise be
        # invisible to the very audit meant to flag it
        try:
            sit = node.subqueries().iterator()
            while sit.hasNext():
                walk(sit.next())
        except Exception:
            counts["skip"] += 1
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(jplan)
    return counts


def run(k: int, out_dir: str) -> None:
    from sales_forecast_pyspark_spark.session import get_spark
    from sales_forecast_pyspark_spark.plans.queries import QUERIES
    from tests.test_plan_invariants import BNLJ_DECLARED

    spark = get_spark("scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    def run_and_plan(name: str, sf_dir: str):
        """Execute the full plan AND return the plan that actually ran.

        AQE replans at runtime (SMJ→BHJ conversions, skew splits), so
        reading executedPlan() from a never-executed frame audits the
        isFinalPlan=false INITIAL plan and would miss exactly the
        runtime join flips this harness exists to catch (code-review
        r08). Executing through the DataFrame's own QueryExecution
        finalizes its AdaptiveSparkPlanExec; the returned jplan is
        that same (finalized) plan object for tree-walk profiling."""
        t0 = time.perf_counter()
        # builder() INSIDE the timer: ML queries fit their model at
        # build time and that cost is part of the query's wall
        df = QUERIES[name].builder(spark, sf_dir)
        jqe = df._jdf.queryExecution()
        jqe.executedPlan().execute().count()
        dt = time.perf_counter() - t0
        return dt, jqe.executedPlan()

    # warmup both dirs (codegen/classloading off the clock)
    for d in (SF_BASE, out_dir):
        QUERIES["daily_rollup"].builder(spark, d).write.format("noop").mode(
            "overwrite"
        ).save()

    results = []
    for name in HEAVY:
        base_t, base_plan = run_and_plan(name, SF_BASE)
        synth_t, synth_plan = run_and_plan(name, out_dir)
        flags = []
        ratio = synth_t / max(base_t, 1e-9)
        # ML fits run jobs at plan-build time; skip their plan diff
        # (same policy as scripts/audit_plans.py).
        if name not in ("forecast_lr",):
            base_p = _join_profile(base_plan)
            synth_p = _join_profile(synth_plan)
            if synth_p["cart"]:
                flags.append("CARTESIAN")
            if base_p["skip"] or synth_p["skip"]:
                flags.append(
                    f"AUDIT_PARTIAL({base_p['skip']}+{synth_p['skip']})"
                )
            if synth_p["bnlj"] and name not in BNLJ_DECLARED:
                flags.append("BNLJ")
            if synth_p["bhj"] > base_p["bhj"]:
                flags.append(f"BCAST_FLIP({base_p['bhj']}->{synth_p['bhj']})")
            if name == "daily_rollup" and synth_p["exch"] > 1:
                flags.append(f"ROLLUP_EXCHANGE({synth_p['exch']})")
            joins = (
                f"smj {base_p['smj']}->{synth_p['smj']} "
                f"bhj {base_p['bhj']}->{synth_p['bhj']}"
            )
        else:
            joins = "(plan diff skipped: fits at build time)"
        if ratio > k * 1.8:
            flags.append(f"SUPERLINEAR({ratio:.1f}x)")
        results.append(
            {
                "query": name,
                "t_sf0.1": round(base_t, 2),
                f"t_{k}x": round(synth_t, 2),
                "ratio": round(ratio, 2),
                "joins": joins,
                "flags": flags,
            }
        )
        print(
            f"{name:32s} {base_t:7.2f}s -> {synth_t:7.2f}s  "
            f"x{ratio:5.2f}  {joins}  {' '.join(flags) or 'ok'}",
            flush=True,
        )

    flagged = [r for r in results if r["flags"]]
    print(json.dumps({"k": k, "results": results, "flagged_count": len(flagged)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["gen", "run"])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=".rehearsal/sf1x")
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of the HEAVY list (e.g. the "
        "star-schema core at a decade where the output-quadratic "
        "pair-mining tier would dominate wall-clock)",
    )
    a = ap.parse_args()
    if a.cmd == "gen":
        if a.queries:
            raise SystemExit("--queries applies to 'run' only; gen always writes all tables")
        gen(a.k, a.out)
    else:
        if a.queries:
            subset = [q.strip() for q in a.queries.split(",") if q.strip()]
            unknown = [q for q in subset if q not in HEAVY]
            if unknown:
                raise SystemExit(f"not in HEAVY list: {unknown}")
            HEAVY[:] = subset
        run(a.k, a.out)


if __name__ == "__main__":
    main()
