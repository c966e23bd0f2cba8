"""Pins the scale-rehearsal generator's invariants at tiny scale
(sf0.001, k=2): the synthesized dataset must keep every foreign key
consistent per copy, decorrelate text/vectors across copies, and be
deterministic — otherwise the SCALING.md rehearsal tables measure a
broken workload. The heavy 10x/30x runs stay script-only; this test
covers the LOGIC in seconds.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from scripts.scale_rehearsal import OFFSET, REMAP, _copy_expr

SF = "/root/testdata/sf0.001"


def test_copy_remap_keeps_fk_consistent_and_counts(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    o2 = _copy_expr(orders, "orders", 1)
    c2 = _copy_expr(cust, "customer", 1)
    # copy-1 keys are disjoint from copy-0
    assert o2.agg(F.min("o_orderkey")).first()[0] >= OFFSET
    # FK join inside copy 1 has exactly as many matches as the original
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    remapped = o2.join(c2, o2.o_custkey == c2.c_custkey).count()
    assert remapped == base
    # dtypes preserved (the cast-back in _copy_expr)
    assert dict(o2.dtypes) == dict(orders.dtypes)


def test_copy_decorrelates_text_and_embeddings(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d1 = _copy_expr(docs, "documents", 1)
    a = docs.orderBy("doc_id").select("text").first()["text"]
    b = d1.orderBy("doc_id").select("text").first()["text"]
    assert a != b and len(a) == len(b), "char permutation must keep length"
    # the affine permutation is a bijection: token structure preserved
    assert a.count(" ") == b.count(" ")
    # regression (code-review r08): plain rotation was the IDENTITY at
    # i % 26 == 0, silently duplicating copies 26-29 in a k=30 run —
    # every copy index must decorrelate, including multiples of 26
    for i in (26, 52):
        ti = (
            _copy_expr(docs, "documents", i)
            .orderBy("doc_id")
            .select("text")
            .first()["text"]
        )
        assert ti != a, f"copy {i} must not be identical to copy 0"

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    e1 = _copy_expr(emb, "embeddings", 1)
    va = emb.orderBy("vec_id").first()["embedding"]
    vb = e1.orderBy("vec_id").first()["embedding"]
    dot = sum(float(x) * float(y) for x, y in zip(va, vb))
    na = math.sqrt(sum(float(x) ** 2 for x in va))
    nb = math.sqrt(sum(float(y) ** 2 for y in vb))
    assert nb > 0 and abs(na - nb) < 1e-3, "sign flips preserve the norm"
    assert abs(dot / (na * nb)) < 0.6, "cross-copy cosine must not stay ~1"


def test_copy_zero_is_identity_and_deterministic(spark):
    for table in REMAP:
        base = spark.read.parquet(f"{SF}/{table}.parquet")
        c0 = _copy_expr(base, table, 0)
        assert c0.exceptAll(base).count() == 0 and base.exceptAll(c0).count() == 0, table
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    x = _copy_expr(emb, "embeddings", 3).orderBy("vec_id").first()["embedding"]
    y = _copy_expr(emb, "embeddings", 3).orderBy("vec_id").first()["embedding"]
    assert list(x) == list(y), "same copy index must be bit-identical"


def test_join_profile_walks_final_adaptive_plan(spark):
    """The tree-walk profiler (code-review r08) is load-bearing for the
    SCALING.md rehearsal verdicts: it must resolve the finalized
    adaptive plan and count each operator exactly once, where string
    counting of the printed tree multi-counts across the nested
    Final/Initial sections."""
    from pyspark.sql import functions as F

    from scripts.scale_rehearsal import _join_profile

    big = spark.range(20000).select(F.col("id").alias("k"), F.rand(7).alias("v"))
    dim = spark.range(50).select(F.col("id").alias("k"), F.lit("d").alias("d"))
    df = big.join(dim, "k").groupBy("d").agg(F.sum("v").alias("s"))
    jqe = df._jdf.queryExecution()
    jqe.executedPlan().execute().count()
    prof = _join_profile(jqe.executedPlan())
    assert prof["bhj"] == 1, prof          # exactly once, not per printed section
    assert prof["smj"] == 0 and prof["cart"] == 0 and prof["bnlj"] == 0, prof
    assert prof["exch"] == 1, prof         # the groupBy hash exchange

    # descends into cached-relation fill plans: the join under .cache()
    # must still be counted after the cache is materialized — and
    # counted ONCE even when TWO branches scan the same cache (the
    # fill executes once; third-pass review caught the double count)
    cached = big.join(dim, "k").cache()
    cached.count()
    one = cached.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    two = cached.groupBy("d").agg(F.sum("v").alias("s"))
    consumer = one.join(two, "d")
    jqe2 = consumer._jdf.queryExecution()
    jqe2.executedPlan().execute().count()
    prof2 = _join_profile(jqe2.executedPlan())
    assert prof2["bhj"] + prof2["smj"] == 2, prof2  # fill join + top join
    assert prof2["skip"] == 0, prof2
    cached.unpersist()


def test_join_profile_sees_subquery_joins(spark):
    """Joins hidden inside scalar subqueries are not in children() —
    the walk must descend node.subqueries() or a CartesianProduct in a
    subquery would be invisible to the audit (third-pass review,
    verified live: the string audit saw it, the first tree-walk did
    not)."""
    from pyspark.sql import functions as F

    from scripts.scale_rehearsal import _join_profile

    big = spark.range(5000).select(F.col("id").alias("k"), F.rand(3).alias("v"))
    dim = spark.range(20).select(F.col("id").alias("k"))
    big.join(dim, "k").createOrReplaceTempView("_sub_joined")
    df = spark.sql(
        "SELECT k, v FROM _sub_joined "
        "WHERE v > (SELECT avg(v) - 10 FROM _sub_joined)"
    )
    jqe = df._jdf.queryExecution()
    jqe.executedPlan().execute().count()
    prof = _join_profile(jqe.executedPlan())
    # the join appears in the main plan AND inside the scalar
    # subquery's plan: both executed, both must be counted
    assert prof["bhj"] + prof["smj"] >= 2, prof
    assert prof["skip"] == 0, prof
    spark.catalog.dropTempView("_sub_joined")
