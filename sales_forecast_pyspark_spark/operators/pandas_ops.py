"""Grouped-map pandas operators (``applyInPandas``) with JVM twins.

The engine's rule: JVM expressions in the hot path, Arrow-batched pandas
only where Spark's built-ins genuinely can't express the semantics. To
keep that honest, each pandas operator here ships with a JVM twin and a
parity test — z-score normalization is the worked example (trivially
JVM-expressible, so the pandas version exists as the TEMPLATE for ops
that aren't: scipy filters, statsmodels decompositions, per-series
model fits).

Scale note: applyInPandas shuffles on the group keys and materializes
ONE GROUP per pandas DataFrame — groups must fit in executor memory
(per-series daily panels do; a monster key needs pre-aggregation).
"""

# NOTE: no `from __future__ import annotations` — it stringifies type
# hints module-wide and breaks pandas-UDF signature inspection.
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_jvm(
    df: DataFrame, keys: Sequence[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """JVM twin: per-group z-score via an unordered window aggregate —
    one exchange on the keys, whole-stage-codegen arithmetic."""
    w = Window.partitionBy(*keys)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    return df.select(
        "*", ((F.col(value_col) - mean) / F.nullif(std, F.lit(0.0))).alias(out_col)
    )


def zscore_pandas(
    df: DataFrame, keys: Sequence[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """applyInPandas version: one pandas DataFrame per group via Arrow.
    Numerically matches the JVM twin (pandas ddof=1 == stddev_samp)."""
    import pandas as pd

    schema_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    out_schema = f"{schema_fields}, {out_col} double"

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        std = v.std(ddof=1)
        pdf[out_col] = (v - v.mean()) / std if std and std > 0 else None
        return pdf

    return df.groupBy(*keys).applyInPandas(_norm, out_schema)


def weighted_mean_jvm(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    weight_col: str,
    out_col: str = "wmean",
) -> DataFrame:
    """JVM twin of the grouped-agg UDAF below: sum(w*v)/sum(w) as plain
    aggregate expressions — one exchange, codegen arithmetic."""
    return df.groupBy(*keys).agg(
        (
            F.sum(F.col(value_col) * F.col(weight_col))
            / F.nullif(F.sum(weight_col), F.lit(0.0))
        ).alias(out_col)
    )


def weighted_mean_pandas(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    weight_col: str,
    out_col: str = "wmean",
) -> DataFrame:
    """Grouped-AGGREGATE pandas UDF (the UDAF tier of the Arrow
    surface): unlike ``applyInPandas`` (full group in, full group out),
    a ``pandas_udf`` aggregate receives the group's COLUMNS and returns
    one scalar — Spark still plans it as a real aggregate with partial
    Arrow batches, so it composes with groupBy like any builtin. Same
    rule as the rest of this module: this trivially-JVM-expressible
    weighted mean is the TEMPLATE (and parity proof) for aggregates
    that genuinely need numpy/scipy."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _wmean(v: pd.Series, w: pd.Series) -> float:
        denom = w.sum()
        return float((v * w).sum() / denom) if denom else None

    return df.groupBy(*keys).agg(
        _wmean(F.col(value_col), F.col(weight_col)).alias(out_col)
    )
