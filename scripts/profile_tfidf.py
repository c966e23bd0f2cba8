"""Stage-level timing for tfidf_similar_docs (VERDICT r07 #7 watch
item): decomposes the query's wall into its four structural stages so
"variance or structure?" is answered with numbers, not narrative.

Usage: python scripts/profile_tfidf.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from sales_forecast_pyspark_spark.session import get_spark
    from sales_forecast_pyspark_spark.sources.readers import read_table
    from sales_forecast_pyspark_spark.llmdata.vectorize import (
        srp_signatures,
        term_tfidf,
        quantized_long,
    )

    spark = get_spark("tfidf-profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents")

    def t(label, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"{label:28s} {time.perf_counter() - t0:6.2f}s", flush=True)
        return out

    # warmup: touch table + codegen
    docs.write.format("noop").mode("overwrite").save()

    weights = term_tfidf(docs).withColumn("_wdec", quantized_long(F.col("w")))
    weights.cache()
    t("weights build + cache fill", lambda: weights.count())

    sig = srp_signatures(weights)
    sig.cache()
    t("srp signatures", lambda: sig.count())

    cand = (
        sig.alias("a")
        .join(sig.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    cand.cache()
    n_cand = t("candidate band join", lambda: cand.count())
    print(f"  candidates: {n_cand}")

    doc_maps = weights.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("term", "_wdec"))).alias("m")
    )
    from sales_forecast_pyspark_spark.functions.deterministic import (
        quantized_total_round,
    )

    scored = (
        cand.join(
            doc_maps.select(F.col("doc_id").alias("doc_a"), F.col("m").alias("_ma")),
            "doc_a",
        )
        .join(
            doc_maps.select(F.col("doc_id").alias("doc_b"), F.col("m").alias("_mb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            quantized_total_round(
                F.expr(
                    "aggregate(map_entries(_ma), 0L, (acc, e) -> "
                    "acc + e.value * coalesce(try_element_at(_mb, e.key), 0L))"
                ),
                out_digits=6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.9)
    )
    t("map verify + threshold", lambda: scored.write.format("noop").mode("overwrite").save())

    # the dfreq join inside term_tfidf: what did AQE actually pick?
    plan = weights._jdf.queryExecution().executedPlan().toString()
    import re

    joins = re.findall(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan)
    print("weights-plan joins:", joins)


if __name__ == "__main__":
    main()
