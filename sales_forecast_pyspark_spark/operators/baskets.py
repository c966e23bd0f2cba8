"""Market-basket co-occurrence analytics (association mining's counting
core) over an order-lines fact.

The naive formulation — "which products appear together?" — is an
all-pairs trap at catalog scale. The scale-safe shape used here never
compares products globally: pairs are generated ONLY within a basket by
a self-equality-join on the basket key, so the fan-out per basket is
bounded by basket size k (k·(k−1)/2 pairs), and the join itself is a
hash join co-located on the basket key. At 100 TB the plan is: one
dedup aggregate (basket, item), one basket-keyed self-join with bounded
fan-out, one hash aggregate on the pair — no step sees the catalog
cross product. Skew guard: a pathological mega-basket (k in the
millions) would blow the quadratic bound; ``max_basket_size`` drops
baskets above a bound in the same pre-aggregate that dedups items
(default 1000 → ≤ ~500k pairs per basket, one task's work).

Lift — P(a,b) / (P(a)·P(b)) — is computed from the three counts with
one double division over exact integers, so it is bit-identical across
engines and partitionings (the division is the last op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bounded_items(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int = 1000,
) -> DataFrame:
    """The shared basket POPULATION every downstream count must agree
    on: distinct (_b, _i) pairs, with baskets larger than
    ``max_basket_size`` dropped whole. Pair counts, item counts, and the
    basket total are all derived from THIS frame — deriving any of them
    from the uncapped input would make lift's numerator and denominators
    disagree about which baskets exist."""
    items = (
        df.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .groupBy("_b", "_i")
        .agg(F.count(F.lit(1)).alias("_dup"))
        .drop("_dup")
    )
    sized = items.withColumn(
        "_k", F.count(F.lit(1)).over(Window.partitionBy("_b"))
    )
    return sized.filter(F.col("_k") <= max_basket_size).drop("_k")


def basket_item_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int = 1000,
) -> DataFrame:
    """(item_a, item_b, n_baskets_together) for every pair co-occurring
    in at least one basket; item_a < item_b. Items are deduped within a
    basket first (a basket contributes each pair once)."""
    return _pairs_from(bounded_items(df, basket_col, item_col, max_basket_size))


def _pairs_from(bounded: DataFrame) -> DataFrame:
    a = bounded.select(F.col("_b"), F.col("_i").alias("item_a"))
    b = bounded.select(F.col("_b"), F.col("_i").alias("item_b"))
    return (
        a.join(b, "_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets_together"))
    )


def basket_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
    top_k: int = 100,
    max_basket_size: int = 1000,
) -> DataFrame:
    """Top co-occurring item pairs with lift.

    lift(a,b) = P(a,b) / (P(a)·P(b)) = n_ab · n_baskets / (n_a · n_b),
    computed as exact long arithmetic with ONE final double division —
    deterministic across engines. Output ordered by support desc then
    (item_a, item_b) — a total order, so ``top_k`` is reproducible.

    All three counts — pair, per-item, and basket total — come from the
    SAME ``max_basket_size``-capped population, so a dropped mega-basket
    is absent from numerator and denominators alike. The basket total
    stays a lazy 1-row broadcast crossJoin (never collected): building
    the query runs no job, and the plan is fused end to end."""
    bounded = bounded_items(df, basket_col, item_col, max_basket_size)
    n_baskets = bounded.agg(F.countDistinct("_b").alias("_n_baskets"))
    item_counts = bounded.groupBy("_i").agg(F.count(F.lit(1)).alias("_n"))
    pairs = _pairs_from(bounded).filter(
        F.col("n_baskets_together") >= min_pair_support
    )
    ca = item_counts.select(F.col("_i").alias("item_a"), F.col("_n").alias("_na"))
    cb = item_counts.select(F.col("_i").alias("item_b"), F.col("_n").alias("_nb"))
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_baskets_together",
            F.round(
                (F.col("n_baskets_together") * F.col("_n_baskets"))
                / (F.col("_na") * F.col("_nb")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_baskets_together"), "item_a", "item_b")
        .limit(top_k)
    )
