"""sales_forecast_pyspark_spark — a PySpark-native analytics + forecasting engine.

Re-expresses the full operator surface of the reference project
(yuhmoreira/sales-forecast-pyspark, a PySpark sales-forecasting pipeline)
as a reusable, composable engine: relational + window operators, MLlib
forecasting pipelines, and large-scale LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design principles (Spark-first, 100 TB-minded):
- Every operator is a pure DataFrame-in / DataFrame-out function so
  Catalyst sees one declarative plan end-to-end (pushdown, pruning,
  join-strategy selection all apply).
- No driver-side loops over data; no ``collect()`` in any hot path.
- Built-in ``pyspark.sql.functions`` everywhere; Pandas UDFs only where
  the built-ins genuinely can't express the semantics.
- Shuffle-conscious defaults: AQE on, broadcast hints for dim tables,
  one shared partitioning reused across window stages.
"""

from sales_forecast_pyspark_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
