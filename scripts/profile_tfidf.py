"""Stage-level timing for tfidf_similar_docs (VERDICT r07 #7 watch
item): decomposes the query's wall into its four structural stages so
"variance or structure?" is answered with numbers, not narrative.

The stage plans come from ``llmdata.vectorize.tfidf_pair_stages`` —
the SAME frames the registered query fuses — so this profile cannot
drift from the production pipeline (code-review r08).

Usage: python scripts/profile_tfidf.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from sales_forecast_pyspark_spark.session import get_spark
    from sales_forecast_pyspark_spark.sources.readers import read_table
    from sales_forecast_pyspark_spark.llmdata.vectorize import tfidf_pair_stages

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

    stages = tfidf_pair_stages(docs)
    stages["weights"].cache()
    t("weights build + cache fill", lambda: stages["weights"].count())

    stages["sig"].cache()
    t("srp signatures", lambda: stages["sig"].count())

    stages["cand"].cache()
    n_cand = t("candidate band join", lambda: stages["cand"].count())
    print(f"  candidates: {n_cand}")

    t(
        "map verify + threshold",
        lambda: stages["scored"].write.format("noop").mode("overwrite").save(),
    )

    # the dfreq join inside term_tfidf: what did AQE actually pick?
    import re

    plan = stages["weights"]._jdf.queryExecution().executedPlan().toString()
    joins = re.findall(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan)
    print("weights-plan joins:", joins)


if __name__ == "__main__":
    main()
