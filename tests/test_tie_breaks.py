"""Tie-stress tests for every serialized top-k / string_agg oracle
surface: construct fixtures with DELIBERATE count ties placed where
string order and native numeric order diverge (user_id 4 vs 10), and
assert Spark-vs-DuckDB equality of the serialized output.

This pins the r05 bug class — "green at the driver's SF because no tie
happened to land in the top-N, divergent under ties" — the same way
tests/test_oracle_types.py pinned the HUGEINT class. The r05 instance:
operators/quality.py::skew_profile sorted its collected top_keys array
by the concat_ws-SERIALIZED key ("10" < "4" lexicographically) while
the oracle and the pre-limit orderBy tie-broke by the numeric key.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _skew_top_keys_string(spark_df, keys, top_n):
    """The exact serialization q_key_skew_profile applies to
    skew_profile's top_keys array (plans/queries.py)."""
    from sales_forecast_pyspark_spark.operators.quality import skew_profile

    out = skew_profile(spark_df, keys, top_n=top_n)
    return out.select(
        F.array_join(
            F.transform(
                "top_keys", lambda s: F.concat_ws(":", s["key"], s["n"].cast("string"))
            ),
            ",",
        ).alias("top_keys")
    ).first()["top_keys"]


def test_skew_profile_numeric_tie_break_matches_oracle(spark, duck):
    """Five keys tied at count 3 fight for four top-5 slots behind one
    clear leader; numeric order must pick AND display 2,4,9,10 (not the
    string order 10,100,2,4)."""
    rows = [(7,)] * 5
    for uid in (4, 10, 9, 100, 2):
        rows += [(uid,)] * 3
    df = spark.createDataFrame(rows, "user_id int")

    duck.register("tie_skew_pdf", pd.DataFrame({"user_id": [r[0] for r in rows]}))
    expected = duck.sql(
        """
        WITH c AS (SELECT user_id, COUNT(*) AS n FROM tie_skew_pdf GROUP BY 1)
        SELECT string_agg(user_id || ':' || n, ',' ORDER BY n DESC, user_id ASC)
        FROM (SELECT user_id, n FROM c ORDER BY n DESC, user_id ASC LIMIT 5)
        """
    ).fetchone()[0]

    assert expected == "7:5,2:3,4:3,9:3,10:3"  # fixture sanity: ties bite
    assert _skew_top_keys_string(df, ["user_id"], 5) == expected


def test_skew_profile_composite_key_tie_break(spark, duck):
    """Composite (numeric, string) key: ties must resolve by the typed
    tuple (int asc, then string asc), not the joined display string."""
    rows = []
    for key, n in [((1, "b"), 4), ((10, "a"), 2), ((2, "z"), 2), ((2, "a"), 2)]:
        rows += [key] * n
    df = spark.createDataFrame(rows, "k1 int, k2 string")

    duck.register(
        "tie_skew2_pdf",
        pd.DataFrame({"k1": [r[0] for r in rows], "k2": [r[1] for r in rows]}),
    )
    expected = duck.sql(
        """
        WITH c AS (SELECT k1, k2, COUNT(*) AS n FROM tie_skew2_pdf GROUP BY 1, 2)
        SELECT string_agg(k1 || '|' || k2 || ':' || n, ','
                          ORDER BY n DESC, k1 ASC, k2 ASC)
        FROM (SELECT k1, k2, n FROM c ORDER BY n DESC, k1 ASC, k2 ASC LIMIT 3)
        """
    ).fetchone()[0]

    assert expected == "1|b:4,2|a:2,2|z:2"
    assert _skew_top_keys_string(df, ["k1", "k2"], 3) == expected


def test_topk_rollup_tie_at_the_cut_matches_exact_oracle(spark, duck):
    """topk_rollup with five items tied exactly AT the k-cut: the
    oversampled estimate + deterministic (count desc, item asc) re-rank
    must pick the same survivors as the exact SQL ROW_NUMBER oracle."""
    from sales_forecast_pyspark_spark.operators.sketches import topk_rollup

    words = ["zz"] * 4
    for w in ("m", "a", "q", "b", "c"):
        words += [w] * 3
    rows = [("en", "s1", w) for w in words] + [("en", "s2", w) for w in words]
    df = spark.createDataFrame(rows, "lang string, source string, w string")

    out = topk_rollup(df, ["lang", "source"], ["lang"], "w", k=3)
    got = [
        (r["lang"], r["item"], r["est_count"], r["rank"])
        for r in out.orderBy("lang", "rank").collect()
    ]

    duck.register(
        "tie_tok_pdf",
        pd.DataFrame(rows, columns=["lang", "source", "w"]),
    )
    expected = duck.sql(
        """
        WITH cnt AS (SELECT lang, w AS item, COUNT(*) AS est_count
                     FROM tie_tok_pdf GROUP BY 1, 2),
        rk AS (SELECT lang, item, est_count,
                      ROW_NUMBER() OVER (PARTITION BY lang
                                         ORDER BY est_count DESC, item ASC) AS rank
               FROM cnt)
        SELECT lang, item, CAST(est_count AS BIGINT), CAST(rank AS INT)
        FROM rk WHERE rank <= 3 ORDER BY lang, rank
        """
    ).fetchall()

    assert [tuple(r) for r in expected] == [
        ("en", "zz", 8, 1),
        ("en", "a", 6, 2),
        ("en", "b", 6, 3),
    ]
    assert got == [tuple(r) for r in expected]
