"""Panel densification: calendar-gap analysis and gap filling.

The reference's window features are ROW-based and deliberately ignore
calendar gaps (SURVEY.md §2.5) — six rows back is not six days back. At
scale, users who want time-based semantics first densify the panel:
generate the full per-series calendar with JVM ``sequence`` + ``explode``
(no UDF), left-join the observations, zero-fill. Densification multiplies
row counts by span/observations, so ``series_gaps`` (cheap, aggregate
only) is the audit step before choosing to densify.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def series_gaps(
    df: DataFrame, keys: Sequence[str], date_col: str = "ds"
) -> DataFrame:
    """Per-series calendar coverage: span days, observed days, missing
    days — one hash aggregate, no fan-out. Use to bound the cost of
    densification before running it."""
    span = F.datediff(F.max(date_col), F.min(date_col)) + 1
    return (
        df.groupBy(*keys)
        .agg(
            F.min(date_col).alias("first_day"),
            F.max(date_col).alias("last_day"),
            span.alias("span_days"),
            F.count(F.lit(1)).alias("n_obs"),
            (span - F.count(F.lit(1))).alias("n_missing"),
        )
        .orderBy(*keys)
    )


def densify_series(
    df: DataFrame,
    keys: Sequence[str],
    date_col: str = "ds",
    fill_zero: Sequence[str] = (),
) -> DataFrame:
    """Fill calendar gaps per series: explode the min..max date sequence
    per key group, left-join observations, zero-fill the named measure
    columns. All JVM-side (sequence/explode/join) — the fan-out equals
    the total span-day count, which ``series_gaps`` quantifies first."""
    calendar = (
        df.groupBy(*keys)
        .agg(F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1"))
        .select(
            *keys,
            F.explode(
                F.sequence(F.col("__d0"), F.col("__d1"), F.expr("interval 1 day"))
            ).alias(date_col),
        )
    )
    out = calendar.join(df, on=[*keys, date_col], how="left")
    if fill_zero:
        out = out.fillna(0, subset=list(fill_zero))
    return out


def locf_fill(
    df: DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
    date_col: str = "ds",
    suffix: str = "_locf",
) -> DataFrame:
    """Last-observation-carried-forward imputation: for each named
    column, add ``{col}{suffix}`` holding the latest non-null value
    at-or-before the row's date within its series — the standard fill
    after ``densify_series`` (sensor/price panels where a gap means
    "unchanged", not "zero"). Cumulative ``last(ignorenulls)`` window:
    one shuffle+sort per key family, O(1) running state, leading gaps
    stay null."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        *df.columns,
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in cols
        ],
    )


def interp_fill(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    date_col: str = "ds",
    out_col: str | None = None,
    out_digits: int = 6,
) -> DataFrame:
    """Linear time interpolation: gap days get
    ``prev + (next - prev) * gap_frac`` between the nearest observed
    values on each side — the fill for continuously varying signals
    (prices, sensor levels) where LOCF's step function biases
    downstream features. Observed rows pass through unchanged; edge
    gaps (no observation on one side) stay null, preserving the audit
    trail.

    Shape: the SAME single exchange+sort as ``locf_fill`` — two
    ignore-nulls windows over one partitioning (backward last +
    forward first, value and date each), all four batched into one
    select so Catalyst plans ONE WindowExec; per-row state is O(1)
    regardless of gap length. Determinism: the gap fraction is a
    quotient of exact day-count integers and the fill is a fixed
    sequence of IEEE double ops, rounded once at ``out_digits`` —
    bit-stable cross-engine (same argument as stable_avg's quotients).
    """
    out_col = out_col or f"{col}_interp"
    back = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(col)
    obs_ds = F.when(v.isNotNull(), F.col(date_col))
    stage = df.select(
        *df.columns,
        F.last(v, ignorenulls=True).over(back).alias("_pv"),
        F.last(obs_ds, ignorenulls=True).over(back).alias("_pd"),
        F.first(v, ignorenulls=True).over(fwd).alias("_nv"),
        F.first(obs_ds, ignorenulls=True).over(fwd).alias("_nd"),
    )
    frac = F.datediff(F.col(date_col), F.col("_pd")).cast("double") / F.datediff(
        F.col("_nd"), F.col("_pd")
    ).cast("double")
    filled = F.when(v.isNotNull(), v).otherwise(
        F.round(F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac, out_digits)
    )
    return stage.select(*df.columns, filled.alias(out_col))
