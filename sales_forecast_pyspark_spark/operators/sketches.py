"""Cardinality and quantile summaries, each in two tiers: an exact form
(oracle-checkable, the correctness reference) and a sketch form (the
100 TB path).

Why the sketch tier matters at scale: exact ``COUNT(DISTINCT x)`` per
group compiles to a two-shuffle plan (dedup on (group, value), then
re-aggregate) whose state is O(distinct values); exact percentiles
buffer every value per group.
The sketch twins — HyperLogLog++ (``approx_count_distinct``) and
Greenwald-Khanna (``percentile_approx``) — are mergeable fixed-size
aggregation buffers: ONE shuffle carrying kilobyte partials regardless
of cardinality, the only shape that survives a 100-billion-row group.
Accuracy is tunable (``rsd`` / ``accuracy``) and regression-tested
against the exact tier in ``tests/test_sketches.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_count(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    rsd: float | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group distinct cardinality. ``rsd=None`` → exact (two-shuffle
    expand plan, O(distinct) state); ``rsd=0.01`` → HLL++ sketch with
    ~1% relative standard deviation (one shuffle, ~kB state/group)."""
    out_col = out_col or f"n_{col}"
    agg = (
        F.countDistinct(F.col(col))
        if rsd is None
        else F.approx_count_distinct(F.col(col), rsd)
    )
    return df.groupBy(*keys).agg(agg.alias(out_col))


def quantile_exprs(
    col: str | Column,
    probs: Sequence[float],
    accuracy: int | None = None,
    prefix: str = "p",
) -> list[Column]:
    """One aggregate expression per requested quantile, named
    ``{prefix}{100·prob:g}`` (``p50``, ``p99``...). ``accuracy=None`` →
    exact ``percentile`` (linear interpolation, matches DuckDB's
    ``quantile_cont`` bit-for-bit on doubles); an int → Greenwald-Khanna
    ``percentile_approx`` with that accuracy (guaranteed rank error ≤
    1/accuracy), the bounded-memory tier."""
    c = F.col(col) if isinstance(col, str) else col
    out = []
    for p in probs:
        name = f"{prefix}{100 * p:g}"
        if accuracy is None:
            out.append(F.percentile(c, F.lit(p)).alias(name))
        else:
            out.append(F.percentile_approx(c, F.lit(p), F.lit(accuracy)).alias(name))
    return out


def hll_rollup(
    df: DataFrame,
    fine_keys: Sequence[str],
    coarse_keys: Sequence[str],
    col: str,
    lg_k: int = 12,
    out_col: str | None = None,
) -> DataFrame:
    """Two-level MERGEABLE distinct-count: build Apache DataSketches HLL
    sketches at the fine grain, then union them upward to the coarse
    grain and estimate there.

    This is the pre-aggregation pattern that makes distinct counts
    feasible at 100 TB: the fine-grain sketch table is tiny (one ~2^lg_k
    byte binary per group), can be PERSISTED as an incremental rollup
    (e.g. one sketch per (country, day) appended daily), and any coarser
    cube — month, country, all-time — is answered by unioning sketches,
    never rescanning the raw data. ``approx_count_distinct`` alone can't
    do this: its sketch dies inside the single aggregation that computed
    it. HLL union is a register-wise max — associative, commutative,
    order-independent — so estimates are deterministic regardless of
    merge order or partitioning.
    """
    out_col = out_col or f"n_{col}"
    fine = df.groupBy(*fine_keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("hll")
    )
    return (
        fine.groupBy(*coarse_keys)
        .agg(F.hll_union_agg(F.col("hll")).alias("hll"))
        .select(*coarse_keys, F.hll_sketch_estimate("hll").alias(out_col))
    )
