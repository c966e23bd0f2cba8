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


def cohort_set_summary(
    a: DataFrame,
    b: DataFrame,
    tags: tuple[str, str, str] = ("both", "only_a", "only_b"),
) -> DataFrame:
    """Venn summary of two single-column key sets via the stock set
    operators: INTERSECT for the overlap, EXCEPT (distinct semantics)
    for each exclusive side — one (segment, n_keys) row per region.

    Catalyst plans INTERSECT/EXCEPT as left-semi/left-anti aggregates
    on the key — the same hash-partitioned shape a hand-written
    semi/anti join would give, so the declarative form costs nothing
    extra at 100 TB and keeps the NULL-handling subtleties (set ops
    match NULL keys; semi joins on ``=`` drop them) in the engine, not
    the caller.
    """
    from pyspark.sql import functions as F

    def tagged(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_keys")).select(
            F.lit(tag).alias("segment"), "n_keys"
        )

    return (
        tagged(a.intersect(b), tags[0])
        .unionByName(tagged(a.subtract(b), tags[1]))
        .unionByName(tagged(b.subtract(a), tags[2]))
        .orderBy("segment")
    )
