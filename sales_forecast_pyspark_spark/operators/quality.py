"""Data-quality constraint checking: the expectations a pipeline
asserts before trusting a table — null ratios, key uniqueness,
referential integrity — computed as aggregates, not row-at-a-time
validators.

Scale design: every check is expressed so ONE scan answers many
constraints at once:
- null/blank ratios for any number of columns fold into a single
  aggregate pass (conditional-count expressions, map-side combined);
- duplicate-key counting is one hash aggregate on the key;
- FK-orphan counting is a left anti join — at 100 TB the dim side is
  either broadcast (small dims) or a shuffled join AQE plans; never a
  collected-to-driver membership set.

The reference's notebook does ad-hoc versions of these checks inline
(null scans and dropDuplicates, Sales_forecast_pyspark.py:101-145);
this operator makes them declarative and reusable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def null_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: total rows, nulls, and null ratio — all
    columns computed in a SINGLE aggregate scan, then unpivoted to the
    long report shape (the stack is over the 1-row aggregate, so the
    unpivot is free)."""
    cols = cols or df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in cols],
    )
    stacked = agg.unpivot(["__n"], cols, "column", "n_null")
    return stacked.select(
        "column",
        F.col("__n").alias("n_rows"),
        "n_null",
        (F.col("n_null") / F.col("__n")).alias("null_ratio"),
    )


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys appearing more than once, with their multiplicity — one
    hash aggregate on the key columns."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def fk_orphans(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Fact rows whose foreign key has no match in the dimension —
    a left ANTI join (null FKs are not orphans; they are surfaced by
    ``null_profile`` instead)."""
    return fact.where(F.col(fact_key).isNotNull()).join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_anti",
    )


def quality_report(
    df: DataFrame,
    not_null: list[str],
    unique_key: list[str] | None = None,
    fk: tuple[str, DataFrame, str] | None = None,
) -> DataFrame:
    """Constraint summary: one row per declared expectation with the
    count of checked rows and violations. Composed of the primitives
    above; each primitive keeps its one-scan / one-aggregate shape and
    the summaries are unioned (tiny, driver-free)."""
    reports = []

    nulls = null_profile(df, not_null).select(
        F.concat(F.lit("not_null:"), F.col("column")).alias("check"),
        F.col("n_rows").alias("n_checked"),
        F.col("n_null").alias("n_violations"),
    )
    reports.append(nulls)

    if unique_key is not None:
        dups = duplicate_keys(df, unique_key).agg(
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("extra")
        )
        key_name = ",".join(unique_key)
        reports.append(
            df.agg(F.count(F.lit(1)).alias("n")).crossJoin(dups).select(
                F.lit(f"unique:{key_name}").alias("check"),
                F.col("n").cast("long").alias("n_checked"),
                F.col("extra").cast("long").alias("n_violations"),
            )
        )

    if fk is not None:
        fact_key, dim, dim_key = fk
        orphans = fk_orphans(df, fact_key, dim, dim_key).agg(
            F.count(F.lit(1)).alias("n_orphan")
        )
        checked = df.agg(
            F.count(F.col(fact_key)).alias("n_nonnull")
        )
        reports.append(
            checked.crossJoin(orphans).select(
                F.lit(f"fk:{fact_key}->{dim_key}").alias("check"),
                F.col("n_nonnull").cast("long").alias("n_checked"),
                F.col("n_orphan").cast("long").alias("n_violations"),
            )
        )

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("check")


def skew_profile(
    df: DataFrame,
    keys: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Per-key distribution diagnosis — the measurement you run BEFORE
    choosing a skew remedy (``salted_join``, AQE skew thresholds,
    repartitioning): one hash aggregate to per-key row counts, then a
    single-row summary of the count distribution plus the ``top_n``
    heaviest keys.

    The output's load-bearing number is ``skew_ratio`` = max key count /
    mean key count: a shuffle on these keys gives its busiest reducer
    ~skew_ratio x the average work, so a ratio around the cluster's
    task-time tolerance (5-10x, AQE's skewedPartitionFactor regime)
    means the plain shuffle is fine and anything far beyond it needs
    salting or a broadcast. ``p50/p99_rows_per_key`` locate where the
    mass sits; ``top_keys`` (key rendered as a string, count) names the
    offenders so the fix can be targeted (e.g. salt ONLY the hot keys).

    Cost: the same one-shuffle aggregate any groupBy on these keys pays,
    over (keys, count) rows only — safe to run on the 100 TB input
    itself. Returns ONE row."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    key_str = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    # collect_list gives no order guarantee after the limit's exchange, so
    # the display order is pinned INSIDE the aggregate: sort_array over
    # (-n, raw key columns) structs, then the sort keys are projected
    # away. The RAW (typed) key columns must be the tie-break — the
    # serialized string would order "10" before "4" and diverge from the
    # numeric ORDER BY ... , key ASC every SQL engine applies.
    top = (
        counts.orderBy(F.desc("_n"), *[F.asc(k) for k in keys])
        .limit(top_n)
        .select(
            F.struct(
                (-F.col("_n")).alias("_neg_n"),
                *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
                key_str.alias("key"),
                F.col("_n").alias("n"),
            ).alias("s")
        )
        .agg(F.sort_array(F.collect_list("s")).alias("_s"))
        .select(
            F.transform(
                "_s", lambda s: F.struct(s["key"].alias("key"), s["n"].alias("n"))
            ).alias("top_keys")
        )
    )
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_n").alias("n_rows"),
        F.max("_n").alias("max_rows_per_key"),
        F.round(F.avg("_n"), 2).alias("mean_rows_per_key"),
        # interpolated quantiles are rounded like every other hashed double
        F.round(F.percentile(F.col("_n"), F.lit(0.5)), 2).alias("p50_rows_per_key"),
        F.round(F.percentile(F.col("_n"), F.lit(0.99)), 2).alias("p99_rows_per_key"),
    ).withColumn(
        "skew_ratio",
        F.round(F.col("max_rows_per_key") / F.col("mean_rows_per_key"), 2),
    )
    return summary.crossJoin(top)  # two 1-row frames


def categorical_mutual_information(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    scale: int = 7,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns — the
    association/drift diagnostic behind feature selection ("does this
    dimension carry signal about that one?") and leakage screens. ONE
    row: (n_events, n_x, n_y, mi_nats).

    MI = Σ_xy p(x,y) · ln( p(x,y) / (p(x)·p(y)) ), computed from exact
    cell counts: one hash aggregate to the (x, y) contingency cells,
    two re-aggregates for the marginals (cell-sized, not data-sized),
    and a 1-row total broadcast — at 100 TB the only data-sized pass is
    the first aggregate; everything after runs on |X|·|Y| rows.

    Determinism follows the ``unigram_surprisal`` pattern: the ln term
    is computed from identical exact-integer-derived doubles in both
    engines and rounded at ``scale``; the expectation is then an exact
    decimal sum of (term × cell count) divided once by N, rounded to 4.
    """
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    cells = df.select(x.alias("_x"), y.alias("_y")).groupBy("_x", "_y").agg(
        F.count(F.lit(1)).alias("_nxy")
    )
    mx = cells.groupBy("_x").agg(F.sum("_nxy").alias("_nx"))
    my = cells.groupBy("_y").agg(F.sum("_nxy").alias("_ny"))
    tot = cells.agg(F.sum("_nxy").alias("_nn"))
    terms = (
        cells.join(mx, "_x")
        .join(my, "_y")
        .crossJoin(F.broadcast(tot))
        .select(
            "_nxy",
            F.round(
                F.log(
                    (F.col("_nxy").cast("double") * F.col("_nn").cast("double"))
                    / (F.col("_nx").cast("double") * F.col("_ny").cast("double"))
                ),
                scale,
            ).alias("_t"),
        )
    )
    return terms.agg(
        F.sum("_nxy").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(
            F.sum(
                F.col("_t").cast(f"decimal(30,{scale})") * F.col("_nxy")
            ).cast("double")
            / F.sum("_nxy"),
            4,
        ).alias("mi_nats"),
    )


def numeric_drift_report(
    base: DataFrame,
    current: DataFrame,
    cols: list[str],
) -> DataFrame:
    """Data-contract drift screen between two snapshots of the same
    table (yesterday's partition vs today's, pre- vs post-migration):
    one row per monitored numeric column with null-rate and mean on
    each side plus the mean shift. The feed-level alarm a 100 TB
    ingest runs before publishing — cheap (ONE aggregate pass per
    side, no joins, no shuffles beyond the final 1-row-per-side agg)
    and deterministic (means are exact decimal sums over pre-rounded
    values divided by counts; null rates are long-count divisions —
    identical IEEE ops cross-engine).

    Each side computes all columns' sufficient statistics in a single
    wide aggregate (n, nulls, decimal sum per column), then unpivots
    to (column, stats) rows via an in-row stack — so adding a monitored
    column adds expressions, not passes.
    """
    def side_stats(df: DataFrame, tag: str) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("_n")]
        for c in cols:
            aggs.append(F.count(c).alias(f"_nn_{c}"))
            aggs.append(
                F.sum(F.round(F.col(c), 7).cast("decimal(30,7)")).alias(f"_s_{c}")
            )
        wide = df.agg(*aggs)
        stack = ", ".join(
            f"'{c}', _nn_{c}, CAST(_s_{c} AS DOUBLE)" for c in cols
        )
        return wide.select(
            F.col("_n"),
            F.expr(
                f"stack({len(cols)}, {stack}) AS (column, _nn, _sum)"
            ),
        ).select(
            "column",
            (1.0 - F.col("_nn") / F.col("_n")).alias(f"null_rate_{tag}"),
            (F.col("_sum") / F.nullif(F.col("_nn"), F.lit(0))).alias(
                f"mean_{tag}"
            ),
        )

    b = side_stats(base, "base")
    c = side_stats(current, "cur")
    return (
        b.join(c, "column")
        .select(
            "column",
            "null_rate_base",
            "null_rate_cur",
            "mean_base",
            "mean_cur",
            (F.col("mean_cur") - F.col("mean_base")).alias("mean_shift"),
        )
        .orderBy("column")
    )


def snapshot_reconcile(
    base: DataFrame,
    current: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    delta_col: str | None = None,
) -> DataFrame:
    """Row-level reconciliation between two snapshots of the same keyed
    table: one FULL OUTER join on the key, every key classified as
    'added' (new in current), 'removed', 'changed' (any compared column
    differs, null-safe), or 'same', summarized to one row per status
    with the key count — plus, when ``delta_col`` names a numeric
    compared column, its exact net delta (current − base, decimal sum).

    The row-level complement of ``numeric_drift_report``: drift says
    WHETHER the feed moved, reconcile says WHICH keys did. Shape: the
    two snapshot aggregates shuffle on the key they already group by,
    the full-outer join reuses that partitioning, and the status
    summary is a 4-row aggregate — one extra exchange end-to-end, no
    driver-side diffing. Null-safe equality (``eqNullSafe``) keeps
    null-vs-value changes visible instead of silently 'same'.
    """
    from sales_forecast_pyspark_spark.functions.deterministic import dec_sum

    # presence markers, not compare-column nullness: a compared column
    # can be legitimately null on a present row
    a = base.select(
        *keys,
        F.lit(1).alias("_in_a"),
        *[F.col(c).alias(f"_a_{c}") for c in compare_cols],
    )
    b = current.select(
        *keys,
        F.lit(1).alias("_in_b"),
        *[F.col(c).alias(f"_b_{c}") for c in compare_cols],
    )
    j = a.join(b, list(keys), "full_outer")
    differs = None
    for c in compare_cols:
        d = ~F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
        differs = d if differs is None else (differs | d)
    status = (
        F.when(F.col("_in_a").isNull(), F.lit("added"))
        .when(F.col("_in_b").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    aggs = [F.count(F.lit(1)).alias("n_keys")]
    if delta_col is not None:
        aggs.append(
            dec_sum(
                F.coalesce(F.col(f"_b_{delta_col}"), F.lit(0.0))
                - F.coalesce(F.col(f"_a_{delta_col}"), F.lit(0.0)),
                scale=2,
            ).alias(f"{delta_col}_delta")
        )
    return (
        j.select(status.alias("status"), *[c for c in j.columns if c not in keys])
        .groupBy("status")
        .agg(*aggs)
        .orderBy("status")
    )
