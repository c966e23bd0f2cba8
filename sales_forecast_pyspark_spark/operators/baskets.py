"""Market-basket co-occurrence analytics (association mining's counting
core) over an order-lines fact.

The naive formulation — "which products appear together?" — is an
all-pairs trap at catalog scale. The scale-safe shape used here never
compares products globally: pairs are generated ONLY within a basket,
so the fan-out per basket is bounded by basket size k (k·(k−1)/2
pairs). Skew guard: a pathological mega-basket (k in the millions)
would blow the quadratic bound; ``max_basket_size`` drops baskets above
a bound (default 1000 → ≤ ~500k pairs per basket, one task's work).

Formulation (r06 rework, measured ~2× on the sf0.1 edge build): each
basket's distinct items are collected into ONE sorted array
(``collect_set`` dedups inside the aggregate — one exchange on the
basket key does dedup + array build), and pairs are expanded IN-ROW
with higher-order functions (``transform`` over the array × its
suffix). This replaces the previous three-exchange shape (dedup
aggregate → basket-size window sort → basket-keyed self-join): no sort,
no join — just exchange, per-row expansion, and the pair aggregate.
Per-task memory for the expansion is bounded by the basket cap
(~500k 16-byte structs worst-case at the default).

Lift — P(a,b) / (P(a)·P(b)) — is computed from the three counts with
one double division over exact integers, so it is bit-identical across
engines and partitionings (the division is the last op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_arrays(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int = 1000,
) -> DataFrame:
    """The shared basket POPULATION every downstream count must agree
    on: one row per basket with its SORTED distinct item array;
    baskets larger than ``max_basket_size`` dropped whole. Pair counts,
    item counts, and the basket total are all derived from THIS frame —
    deriving any of them from the uncapped input would make lift's
    numerator and denominators disagree about which baskets exist."""
    return (
        df.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .groupBy("_b")
        .agg(F.array_sort(F.collect_set("_i")).alias("_items"))
        .filter(F.size("_items") <= max_basket_size)
    )


def _pairs_from_arrays(baskets: DataFrame) -> DataFrame:
    # element at 0-based index i pairs with every LATER element of the
    # sorted array (1-based slice start i+2), so item_a < item_b by
    # construction and each basket contributes each pair exactly once.
    pair = F.explode(
        F.expr(
            "flatten(transform(_items, (x, i) -> "
            "transform(slice(_items, i + 2, size(_items) - i - 1), "
            "y -> struct(x AS item_a, y AS item_b))))"
        )
    ).alias("p")
    return (
        baskets.select(pair)
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets_together"))
    )


def basket_item_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int = 1000,
) -> DataFrame:
    """(item_a, item_b, n_baskets_together) for every pair co-occurring
    in at least one basket; item_a < item_b. Items are deduped within a
    basket first (a basket contributes each pair once)."""
    return _pairs_from_arrays(
        basket_arrays(df, basket_col, item_col, max_basket_size)
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
    baskets = basket_arrays(df, basket_col, item_col, max_basket_size)
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("_n_baskets"))
    item_counts = (
        baskets.select(F.explode("_items").alias("_i"))
        .groupBy("_i")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    pairs = _pairs_from_arrays(baskets).filter(
        F.col("n_baskets_together") >= min_pair_support
    )
    ca = item_counts.select(F.col("_i").alias("item_a"), F.col("_n").alias("_na"))
    cb = item_counts.select(F.col("_i").alias("item_b"), F.col("_n").alias("_nb"))
    return (
        # shuffle_hash hints (static-broadcast audit r09): the pair
        # frame and the item-count frames all sit behind the basket/
        # pair explode and are catalog-scale — static broadcast
        # estimates under a Generate are fiction AQE cannot demote.
        # The item-count sides are aggregated one-row-per-item frames
        # (uniformly keyed, rows/partitions bounded at any scale), so
        # building their hash per partition beats sort-merge: SMJ
        # would sort the PAIR-scale side twice; `n_baskets` stays
        # broadcast (1-row global agg, bounded by construction)
        pairs.join(ca.hint("shuffle_hash"), "item_a")
        .join(cb.hint("shuffle_hash"), "item_b")
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
