"""Distributed prefix (cumulative) aggregation.

The textbook cumulative sum — ``SUM(x) OVER (ORDER BY k)`` with no
PARTITION BY — is a scale trap: Spark plans an un-partitioned window,
which funnels EVERY row through a single task. Fine on a catalog-sized
frame, fatal on a fact table.

``partitioned_cumsum`` is the classic two-phase distributed scan:

1. range-repartition on the total order (the same exchange a global
   sort pays — balanced by sampled range boundaries);
2. a per-partition running sum (window PARTITIONED by the physical
   partition id — every task scans only its own slice);
3. per-partition totals (one tiny row per partition) turned into
   exclusive offsets with a window over the partition ids — a frame
   bounded by the partition COUNT, not the data;
4. offsets broadcast back and added.

The output value for a row is the exact sum over all rows at-or-before
it in the TOTAL order, so results are independent of where the sampled
range boundaries happen to fall — partition ids are internal scaffolding
and are projected away. Sums are decimal (associative, exact), so the
cumulative values are also independent of intra-partition evaluation
order. The order columns MUST form a total order (tie-break with a
unique key), otherwise "before" is ill-defined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def partitioned_cumsum(
    df: DataFrame,
    order_by: list[Column],
    value: Column,
    out_col: str,
    num_partitions: int | None = None,
    scale: int = 6,
    precision: int = 30,
) -> DataFrame:
    """All input columns plus ``out_col`` = exact cumulative sum of
    ``value`` (decimal at ``scale``) in ``order_by`` order.

    ``order_by``: columns/expressions forming a TOTAL order (ascending
    and descending both fine — pass ``F.desc(...)`` wrapped columns via
    ``F.col(c).desc()`` expressions built by the caller).
    """
    dec = value.cast(f"decimal({precision},{scale})")
    ranged = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    staged = ranged.withColumn("_cs_pid", F.spark_partition_id()).withColumn(
        "_cs_v", dec
    )
    local_w = (
        Window.partitionBy("_cs_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = staged.withColumn("_cs_local", F.sum("_cs_v").over(local_w))
    totals = staged.groupBy("_cs_pid").agg(F.sum("_cs_v").alias("_cs_tot"))
    # Exclusive prefix over the partition TOTALS: one row per partition,
    # so the un-partitioned window here is bounded by the partition
    # count — the whole point of the two-phase scan.
    off_w = (
        Window.orderBy("_cs_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn("_cs_off", F.sum("_cs_tot").over(off_w)).select(
        "_cs_pid", "_cs_off"
    )
    out = (
        local.join(F.broadcast(offsets), "_cs_pid")
        .withColumn(
            out_col,
            (F.coalesce(F.col("_cs_off"), F.lit(0)) + F.col("_cs_local")).cast(
                f"decimal({precision},{scale})"
            ),
        )
        .drop("_cs_pid", "_cs_v", "_cs_local", "_cs_off")
    )
    return out
