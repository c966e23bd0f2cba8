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
