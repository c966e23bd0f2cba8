"""Persistent IVF-PQ index (llmdata/ann_index.py): build-once /
query-many parity with the in-memory operator, the partition-pruned
code scan that justifies the layout, the recall tier bar, and the
geometry guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_forecast_pyspark_spark.llmdata import (
    build_ivfpq_index,
    query_ivfpq_index,
)
from sales_forecast_pyspark_spark.llmdata.similarity import (
    cosine_topk,
    ivfpq_topk,
    topk_recall_audit,
)

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")


@pytest.fixture(scope="module")
def index_path(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    meta = build_ivfpq_index(emb, path)
    assert meta["n_vectors"] == emb.count()  # no zero-norm rows in fixture
    return path


def test_index_query_matches_in_memory_operator(spark, emb, index_path):
    """Same seeds + same corpus ⇒ the persisted index must return
    EXACTLY the rows the fit-and-query operator returns (the plan
    differs — code-only scan + refine join — the results must not)."""
    queries = emb.filter(F.col("vec_id") < 20)
    mem = {tuple(r) for r in ivfpq_topk(emb, queries, k=5).collect()}
    idx = {
        tuple(r)
        for r in query_ivfpq_index(spark, index_path, queries, k=5).collect()
    }
    assert idx == mem and len(idx) > 0


def test_index_scan_prunes_unprobed_cell_partitions(spark, emb, index_path):
    """The layout's point: probed cells reach the code scan as a STATIC
    PartitionFilter (driver-side IN-list, no DPP needed), so unprobed
    cells are never read. One query probes n_probe=6 of 16 cells; the
    physical plan must carry a partition filter on `cell`."""
    queries = emb.filter(F.col("vec_id") < 1)
    plan = (
        query_ivfpq_index(spark, index_path, queries, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [cell" in plan.replace("#", " #").replace(
        "cell #", "cell#"
    ) or "PartitionFilters: [cell" in plan, plan[:4000]


def test_index_query_meets_the_ivfpq_tier_bar(spark, emb, index_path):
    """The persisted path inherits the operator's contracted tier:
    pooled recall >= 0.5 vs brute force (the minimum-IO tier bar)."""
    queries = emb.filter(F.col("vec_id") < 20)
    row = (
        topk_recall_audit(
            query_ivfpq_index(spark, index_path, queries, k=5),
            cosine_topk(emb, queries, k=5),
        )
        .select("mean_recall", "recall_ok")
        .first()
    )
    assert row["recall_ok"] is True
    assert row["mean_recall"] >= 0.5


def test_index_rejects_mismatched_query_dimension(spark, emb, index_path):
    """The meta table is a geometry CONTRACT: a query set with the
    wrong dimensionality fails loudly at plan time, not with silent
    zip_with truncation worker-side."""
    bad = emb.select(
        "vec_id", F.slice(F.col("embedding"), 1, 32).alias("embedding")
    ).filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="query dimension 32 != index dimension"):
        query_ivfpq_index(spark, index_path, bad, k=5)


def test_append_reencodes_bit_identically_and_serves_new_vectors(
    spark, emb, tmp_path_factory
):
    """Incremental ingest: (a) re-encoding vectors the index already
    saw through the stored codebooks yields the SAME (cell, codes) the
    build wrote — the Arrow encoder replays KMeans-transform math
    exactly; (b) appended near-duplicate vectors are immediately
    served: a query for a planted near-dup finds it at rank 1."""
    from sales_forecast_pyspark_spark.llmdata import append_to_ivfpq_index

    path = str(tmp_path_factory.mktemp("ivfpq_app") / "idx")
    base = emb.filter(F.col("vec_id") < 400)
    build_ivfpq_index(base, path)
    before = {
        r["neighbor_id"]: (r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(f"{path}/codes").collect()
    }

    # (a) re-encode a slice of the SAME vectors under shifted ids
    re_slice = base.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    n = append_to_ivfpq_index(re_slice, path)
    assert n == 50
    after = {
        r["neighbor_id"]: (r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    for i in range(50):
        assert after[i + 10_000] == before[i], i

    # (b) plant an exact duplicate of vec_id 7 under a new id and query
    dup = base.filter(F.col("vec_id") == 7).select(
        F.lit(99_999).cast("long").alias("vec_id"), "embedding"
    )
    assert append_to_ivfpq_index(dup, path) == 1
    meta = spark.read.parquet(f"{path}/meta").first()
    assert meta["n_vectors"] == 400 + 50 + 1
    # two exact copies of vector 7 now live in the index (10007 from
    # the re-encoded slice, 99999 from the planted dup): both must be
    # served at cos 1.0, id tie-break ordering them
    got = query_ivfpq_index(
        spark, path, base.filter(F.col("vec_id") == 7), k=2
    ).collect()
    assert [(r["neighbor_id"], r["cos_sim"]) for r in got] == [
        (10_007, 1.0),
        (99_999, 1.0),
    ]


def test_append_rejects_mismatched_dimension(spark, emb, index_path):
    from sales_forecast_pyspark_spark.llmdata import append_to_ivfpq_index

    bad = emb.select(
        "vec_id", F.slice(F.col("embedding"), 1, 32).alias("embedding")
    ).filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="append dimension 32 != index"):
        append_to_ivfpq_index(bad, index_path)
