"""Feature engineering for the forecast models — the reference's
daily_sales_v2/v3 feature build (Sales_forecast_pyspark.py:607-988)
re-expressed as one parameterized builder over the panel.

Reference shapes reproduced by the defaults:
- 36 lag features (py:611-647): daily lags 1..6 and 6-day-cycle lags
  6,12,..,36 of qty AND price over (country, stock), same-weekday lags
  1..6 over (country, stock, dow). Lags are round-then-coalesce(0),
  qty rounded to 0 digits (py:616) and price to 2.
- 18 rolling stats (py:903-946): mean/std/approx-median over trailing
  row frames w ∈ {3,6,12} per series and w ∈ {3,4,5} per weekday.
- 12 momentum diffs (py:949-966): qty minus each rolling mean/median.
- fillna(0) over every feature (py:969-982) — "no history" and "zero
  sales" deliberately indistinguishable.

All expressions for one (partitioning, ordering) pair land in a single
WindowExec; the weekday windows reuse the series exchange because their
partition keys are a superset of (country, stock). Features must be
computed BEFORE the train/test time split (SURVEY.md §4 row 1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sales_forecast_pyspark_spark.operators.windows import (
    add_momentum,
    lag_exprs,
    rolling_exprs,
)


def with_log1p(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """The reference's log-target transform (py:360-363):
    ``log1p(col)`` as a new column (computed there, never consumed —
    kept for surface parity)."""
    return df.select("*", F.log1p(F.col(col)).alias(out_col or f"{col}_log1p"))


def build_features(
    df: DataFrame,
    keys: Sequence[str] = ("country", "stock"),
    order_col: str = "ds",
    target: str = "qty",
    price_col: str | None = "avg_price",
    dow_col: str = "dow",
    daily_lags: Sequence[int] = (1, 2, 3, 4, 5, 6),
    cycle_lags: Sequence[int] = (6, 12, 18, 24, 30, 36),
    weekday_lags: Sequence[int] = (1, 2, 3, 4, 5, 6),
    rolling_windows: Sequence[int] = (3, 6, 12),
    weekday_windows: Sequence[int] = (3, 4, 5),
    rolling_stats: Sequence[str] = ("mean", "std", "median_approx"),
) -> tuple[DataFrame, list[str]]:
    """Build the full lag + rolling + momentum feature set.

    Returns ``(df_with_features, feature_column_names)`` so callers can
    hand the list straight to a VectorAssembler.
    """
    lag_cols = [target] + ([price_col] if price_col else [])

    exprs: list = []
    names: list[str] = []

    def _round_digits(col: str) -> int:
        return 0 if col == target else 2

    # W1: daily per-series lags of target (round 0) and price (round 2).
    for col in lag_cols:
        exprs += lag_exprs(keys, order_col, [col], daily_lags, _round_digits(col))
        names += [f"{col}_lag{o}" for o in daily_lags]
    # W2: 6-day-cycle "weekly" lags — a separate feature family (the
    # reference keeps them distinct from the dailies even where offsets
    # overlap, py:625-634).
    for col in lag_cols:
        exprs += lag_exprs(
            keys, order_col, [col], cycle_lags, _round_digits(col),
            name_fmt="{col}_cyc{off}",
        )
        names += [f"{col}_cyc{o}" for o in cycle_lags]
    # W3: same-weekday lags over the 3-key partition.
    for col in lag_cols:
        exprs += lag_exprs(
            [*keys, dow_col], order_col, [col], weekday_lags,
            _round_digits(col), name_fmt="{col}_dowlag{off}",
        )
        names += [f"{col}_dowlag{o}" for o in weekday_lags]
    # W4/W5: per-series rolling stats over trailing row frames.
    exprs += rolling_exprs(keys, order_col, target, rolling_windows, rolling_stats)
    names += [f"roll_{s}_{w}" for w in rolling_windows for s in rolling_stats]
    # W6: weekday rolling stats.
    exprs += rolling_exprs(
        [*keys, dow_col], order_col, target, weekday_windows, rolling_stats,
        name_fmt="dow_roll_{stat}_{w}",
    )
    names += [f"dow_roll_{s}_{w}" for w in weekday_windows for s in rolling_stats]

    out = df.select("*", *exprs)

    # W7: momentum diffs against every rolling mean/median (py:949-966).
    diff_refs = [n for n in names if ("mean" in n or "median" in n)]
    out = add_momentum(out, target, diff_refs)
    names += [f"diff_{r}" for r in diff_refs]

    out = out.fillna(0, subset=names)
    return out, names


def cap_categories(
    train: DataFrame,
    test: DataFrame,
    col: str,
    top_k: int,
    other: str | int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Bound a categorical column's cardinality before tree models:
    keep the ``top_k`` most frequent TRAIN values, fold the tail into
    ``other`` (same mapping applied to both splits — the keep-set must
    not see test data).

    Why this exists: DecisionTree/RF/GBT require
    ``maxBins >= |categories|``, and the training-side cost of raising
    maxBins is NOT a validation detail — each task's partial-aggregate
    buffer holds numBins × 3 doubles per feature per tree node in the
    group, so maxBins that tracks a high-cardinality column (20k stocks
    at sf0.1, millions of SKUs at 100 TB) multiplies tree-stat memory by
    1000× and OOMs long before the model learns anything from
    single-digit-support categories. The scalable shape is the one
    production feature pipelines use: cap the cardinality at the bin
    budget — frequent categories keep their identity (and carry nearly
    all the split signal), the long tail shares one bucket.

    Deterministic: ties in the frequency cut are broken by category
    value. Plan shape: one hash-agg over train + a broadcast-hash join
    of the ≤ top_k keep-set against each split — no extra shuffle at
    any scale.

    ``other`` defaults by column type: ``"__other__"`` for strings,
    ``-1`` for numeric keys (surrogate keys are non-negative; pass an
    explicit sentinel if yours are not). The sentinel is cast to the
    column's type, so the schema is unchanged.
    """
    if other is None:
        other = (
            "__other__"
            if train.schema[col].dataType.typeName() == "string"
            else -1
        )
    dtype = train.schema[col].dataType
    keep = (
        train.groupBy(col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .orderBy(F.col("_cnt").desc(), F.col(col))
        .limit(top_k)
        .select(col, F.lit(True).alias("_keep"))
    )

    def _apply(df: DataFrame) -> DataFrame:
        return (
            df.join(F.broadcast(keep), on=col, how="left")
            .withColumn(
                col,
                F.when(F.col("_keep"), F.col(col)).otherwise(
                    F.lit(other).cast(dtype)
                ),
            )
            .drop("_keep")
        )

    return _apply(train), _apply(test)
