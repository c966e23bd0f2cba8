"""Multi-dimensional data layout: z-order (Morton) clustering so
parquet min/max statistics stay tight on SEVERAL filter columns at
once.

Why this matters at 100 TB: a table sorted by one column prunes scans
on that column only — every other predicate reads everything. Mapping
each row to the Morton code of its filter columns and range-
partitioning + sorting by that code gives every output file a small
bounding BOX across all the encoded columns, so row-group/file min-max
skipping works for filters on any of them (the same trick behind
Delta/Iceberg OPTIMIZE ZORDER; e.g. the Databricks engineering
literature on z-ordering, public knowledge).

Shape: one tiny stats aggregate (min/max per column, a 2-value scalar
per column to the driver — production engines read these from catalog
stats instead), then a map-only bit-interleave expression, then ONE
range shuffle on the z-value. Nothing quadratic, nothing iterative.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(norm_cols: list[Column], bits: int) -> Column:
    """Bitwise interleave: bit b of column j lands at position
    b * n_cols + j. Compiles to a flat shift/and/or expression tree —
    whole-stage-codegen friendly, no UDF."""
    z = F.lit(0).cast("long")
    n = len(norm_cols)
    for b in range(bits):
        for j, c in enumerate(norm_cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + j))
    return z


def zvalue(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Attach a ``__zvalue`` Morton code over ``cols``.

    Each column is min-max scaled onto the ``[0, 2^bits)`` integer grid
    (one stats pass; constant-value columns collapse to 0), then the
    grids are bit-interleaved. Linear scaling keeps the code cheap and
    deterministic; heavily skewed columns would prefer rank/quantile
    bucketing — swap the normalizer if that's the workload.

    ``bits * len(cols)`` must fit a long (<= 62).
    """
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must be <= 62 to fit a long")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"max_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    norm = []
    for c in cols:
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        span = (hi - lo) if (hi is not None and lo is not None and hi > lo) else None
        if span is None:
            norm.append(F.lit(0).cast("long"))
        else:
            scaled = F.floor(
                (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(top + 1)
            )
            norm.append(
                F.least(F.lit(top).cast("long"), F.greatest(F.lit(0).cast("long"), scaled))
            )
    return df.withColumn("__zvalue", _interleave(norm, bits)), "__zvalue"


def zorder_layout(
    df: DataFrame, cols: list[str], num_partitions: int, bits: int = 16
) -> DataFrame:
    """Cluster ``df`` for multi-column data skipping: range-partition +
    sort by the Morton code of ``cols``. Writing the result partitioned
    this way gives every file/row-group a tight bounding box on ALL of
    ``cols``, so min-max pruning works for any of them."""
    zdf, zcol = zvalue(df, cols, bits)
    return (
        zdf.repartitionByRange(num_partitions, F.col(zcol))
        .sortWithinPartitions(zcol)
        .drop(zcol)
    )
