"""Z-order layout: Morton-code correctness vs a Python reference and
the locality property that justifies it (per-partition bounding boxes
stay tight on BOTH columns, unlike a single-column sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_forecast_pyspark_spark.operators.layout import zorder_layout, zvalue


def _morton(vals: list[int], bits: int) -> int:
    z = 0
    for b in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + j)
    return z


def test_zvalue_matches_python_morton(spark):
    """On data already on the [0, 2^bits) grid, min-max scaling is the
    identity and the column must equal the reference Morton code."""
    n = 16
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    zdf, zcol = zvalue(df, ["x", "y"], bits=4)
    got = {(r["x"], r["y"]): r[zcol] for r in zdf.collect()}
    for x, y in rows:
        assert got[(x, y)] == _morton([x, y], 4), (x, y)


def test_zvalue_guards_width_and_constant_columns(spark):
    df = spark.createDataFrame([(1, 7), (2, 7)], "a long, b long")
    with pytest.raises(ValueError, match="<= 62"):
        zvalue(df, ["a", "b"], bits=32)
    zdf, zcol = zvalue(df, ["a", "b"], bits=4)
    # constant column contributes 0 bits; codes still distinct on `a`
    codes = [r[zcol] for r in zdf.orderBy("a").collect()]
    assert codes[0] != codes[1]


def test_zorder_layout_tightens_bounding_boxes(spark):
    """The data-skipping property: on a uniform 64x64 grid split into
    16 partitions, a single-column sort leaves every partition spanning
    the FULL range of the other column, while z-order keeps both sides'
    per-partition ranges a fraction of the domain."""
    n, parts = 64, 16
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")

    def max_side(frame):
        spans = (
            frame.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (F.max("x") - F.min("x")).alias("dx"),
                (F.max("y") - F.min("y")).alias("dy"),
            )
            .collect()
        )
        return max(max(r["dx"], r["dy"]) for r in spans)

    linear = df.repartitionByRange(parts, "x").sortWithinPartitions("x")
    zordered = zorder_layout(df, ["x", "y"], parts, bits=6)
    # linear layout: y is unconstrained within every partition (span 63)
    assert max_side(linear) == n - 1
    # z-order: every partition is a quadrant-ish box; both sides bounded
    assert max_side(zordered) <= (n // 4) - 1
