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
