"""Per-series anomaly detection over the daily panel: trailing-window
z-scores from rolling sufficient statistics.

The forecastability lens the reference's pipeline lacks: before fitting
models on demand history (Sales_forecast_pyspark.py's lag/rolling
feature blocks, py:614-982), flag the observations that are wildly out
of distribution for THEIR OWN series — data-entry glitches, one-off bulk
orders, stockout zeros — so they can be winsorized (see
``operators.rowops.winsorize``) or excluded from training.

Statistical shape: for each row, mean/std of the TRAILING ``window``
rows excluding the current one (the same leakage-free frame discipline
as the feature windows — the current value must not influence its own
expectation), z = (x − mean) / std, flag |z| ≥ threshold. Series
segments with fewer than ``min_obs`` prior observations or zero
variance produce no flag — a 2-observation series cannot be anomalous.

Determinism: std comes from rolling SUM / SUM-of-squares / COUNT
(integer-exact on integer-valued inputs like summed quantities) rather
than ``stddev_samp``'s running-moment accumulation, so mean, std, z and
the |z| ≥ threshold cut are bit-identical across engines and
partitionings — this query is fully oracle-hashable.

Scale: one exchange on the series keys shared by sort and window; the
statistics are single-pass window aggregates. Identical cost profile to
the feature windows that already run on the 100 TB panel.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore_anomalies(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    window: int = 28,
    min_obs: int = 14,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Rows of ``df`` whose ``value_col`` deviates ≥ ``z_threshold``
    sample standard deviations from their trailing-``window`` mean.

    Adds ``exp_val`` (the trailing mean, rounded to 4), ``z`` (rounded
    to 4 for display; the flag uses the unrounded value so the cut is
    exact)."""
    frame = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-window, -1)
    )
    x = F.col(value_col)
    cnt = F.count(x).over(frame)
    s1 = F.sum(x).over(frame)
    s2 = F.sum(x * x).over(frame)
    mean = s1 / cnt
    var = (s2 - s1 * s1 / cnt) / (cnt - 1)
    std = F.sqrt(var)
    z = (x - mean) / std
    return (
        df.select(
            "*",
            cnt.alias("_cnt"),
            mean.alias("_mean"),
            std.alias("_std"),
            z.alias("_z"),
        )
        .filter(
            (F.col("_cnt") >= min_obs)
            & (F.col("_std") > 0)
            & (F.abs(F.col("_z")) >= z_threshold)
        )
        .select(
            *df.columns,
            F.round(F.col("_mean"), 4).alias("exp_val"),
            F.round(F.col("_z"), 4).alias("z"),
        )
    )
