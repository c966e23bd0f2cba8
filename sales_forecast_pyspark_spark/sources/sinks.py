"""Write sinks.

The reference has no Spark write sink (its only outputs are
``toPandas()`` report tables and matplotlib PNGs — Sales_forecast_pyspark.py
S3/S6 in SURVEY.md §2.1). The engine adds parquet writes because any
pipeline at scale must persist intermediate tables; partitioned writes
enable downstream partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
