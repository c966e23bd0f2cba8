"""Write sinks + the pandas reporting boundary.

The reference's only outputs are ``toPandas()`` report tables and
matplotlib PNGs (S3/S6 in SURVEY.md §2.1, ~16 call sites). The engine
adds parquet writes because any pipeline at scale must persist
intermediate tables, and wraps the collect-to-client boundary so every
report path goes through one guarded, Arrow-accelerated function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def to_report_frame(df: DataFrame, limit: int | None = 10000):
    """S3: the collect-to-client boundary (Sales_forecast_pyspark.py:184
    etc.) — Arrow-batched ``toPandas()`` (enabled in session defaults)
    with a guard limit, because an unbounded driver-side collect is the
    classic scale accident. Pass ``limit=None`` only for aggregates you
    KNOW are small."""
    if limit is not None:
        df = df.limit(limit)
    return df.toPandas()


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: pre-shuffles rows into
    ``num_buckets`` files by hash of ``bucket_cols`` (optionally sorted
    within each bucket) so that later equi-joins and aggregations on
    those columns read co-located data and plan with ZERO exchanges —
    the write-once-join-often amortization that matters when a fact
    table is joined every day at 100 TB. Both join sides must be
    bucketed on the join key; matching bucket counts avoid the
    one-side-reshuffle fallback. Tested shuffle-free in
    tests/test_io.py::test_bucketed_join_is_shuffle_free.

    Spark's bucketing requires ``saveAsTable`` (metastore-tracked
    managed table under ``spark.sql.warehouse.dir``), not a bare
    ``.parquet(path)`` write."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink. ``partition_by`` on low-cardinality columns (e.g. a
    date column) makes later time-range filters partition-prunable;
    ``max_records_per_file`` bounds file sizes on skewed partitions.
    """
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
