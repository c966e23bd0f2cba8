"""Registry-wide static-broadcast sweep as CI (VERDICT r09 ask #3 /
r10 ask #2).

The bug class: Catalyst's static size estimates do not model explode
fan-out, so a frame behind a Generate can look broadcast-able while its
true size is corpus-scale — and AQE cannot demote a statically planned
BroadcastExchange (only shuffle stages are re-measured at runtime), so
the plan driver-OOMs the moment the corpus outgrows the estimate. The
r09 100x dedup rehearsal hit it live (`llmdata/dedup.py::
_jaccard_on_pairs`); scripts/audit_static_broadcasts.py then found 16
more sites registry-wide. Until now the sweep was a manual script —
this test makes it a suite gate, plan-build only (no execution), over
EVERY non-SKIP registered query at sf0.001.

Two directions, both required for the gate to mean anything:
- negative: the full registry sweep reports zero unbounded
  Generate-fed static broadcasts and zero build errors (an erroring
  build must never read as green — the script's old vacuous-FLAGGED:[]
  failure, twice);
- positive: a hand-built Generate-fed broadcast join IS flagged by the
  same walk (so a Spark upgrade that renames plan nodes breaks the
  control, not just silently blinds the sweep), and its merge-hinted
  twin is not.
"""

from __future__ import annotations

import pytest

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from audit_static_broadcasts import SKIP, audit_frame, sweep  # noqa: E402

from sales_forecast_pyspark_spark.plans.queries import QUERIES  # noqa: E402

from conftest import SF_SMALL  # noqa: E402


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_positive_control_generate_fed_broadcast_is_flagged(spark):
    """A broadcast OF an exploded frame — the exact shape that OOMs at
    scale — must flag. If this stops flagging (Spark rename, walk
    regression), the registry sweep below is blind, not clean."""
    docs = _docs(spark)
    exploded = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    other = docs.select(F.col("doc_id").alias("d2"), "source")
    bad = other.join(F.broadcast(exploded), other.d2 == exploded.doc_id)
    hits = audit_frame(bad)
    assert hits, (
        "the hand-built Generate-fed broadcast join was NOT flagged — "
        "the sweep walk is blind (plan-node rename or unwrap regression)"
    )
    assert any("BroadcastExchange" in h for h in hits)


def test_positive_control_merge_hinted_twin_is_clean(spark):
    """The fix shape (merge hint forces a shuffle join; AQE can size
    it at runtime) must NOT flag — otherwise the sweep over-reports
    and the registry gate would train people to grow ALLOWED."""
    docs = _docs(spark)
    exploded = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    other = docs.select(F.col("doc_id").alias("d2"), "source")
    good = other.join(exploded.hint("merge"), other.d2 == exploded.doc_id)
    assert audit_frame(good) == []


def test_generate_above_global_agg_still_flags_into_allowed(spark):
    """Policy pin: Generate is NEVER structurally exempted, even over a
    1-row global aggregate — explode(sequence(min, max)) over one row
    is corpus-scale, so constant-arity cases (lineitem_drift_report's
    stack(3)) must pass through the per-query ALLOWED budget with a
    written justification, not a blanket rule. If this stops flagging,
    the structural exemption grew to swallow generators."""
    docs = _docs(spark)
    one_row = docs.agg(
        F.count("*").alias("n"), F.avg("n_chars").alias("avg_chars")
    )
    tall = one_row.select(
        F.explode(
            F.array(
                F.struct(F.lit("n").alias("k"), F.col("n").cast("double").alias("v")),
                F.struct(F.lit("avg").alias("k"), F.col("avg_chars").alias("v")),
            )
        ).alias("kv")
    ).select("kv.k", "kv.v")
    audited = docs.crossJoin(F.broadcast(tall))
    assert audit_frame(audited), "constant-arity Generate was structurally exempted"


def test_global_agg_over_exploded_data_is_exempt(spark):
    """The structural exemption that IS sound: a global aggregate is
    <= 1 row by construction no matter what explodes beneath it, so a
    broadcast of agg(explode(...)) must not flag — scalar audit frames
    over token-level stats are a standard shape in the registry."""
    docs = _docs(spark)
    scalar = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).agg(F.count("*").alias("n_tokens"))
    audited = docs.crossJoin(F.broadcast(scalar))
    assert audit_frame(audited) == []


@pytest.mark.slow
def test_registry_sweep_no_static_broadcast_of_exploded_frames(spark):
    """The gate: every registered, plan-buildable query's STATIC plan
    at sf0.001 carries no unbounded Generate-fed BroadcastExchange and
    every build succeeds. Scale-dir choice matters less than it looks:
    the flagged shapes are those where Catalyst trusts a fictional
    post-explode estimate, and at sf0.001 estimates are SMALLER, i.e.
    broadcasts MORE eagerly — the conservative direction for this gate
    (confirmed: the 17 r09 findings all reproduced at small SF)."""
    flagged, errors = sweep(spark, SF_SMALL)
    assert errors == [], f"query builds errored during the sweep: {errors}"
    assert flagged == [], (
        "unbounded Generate-fed static BroadcastExchange(s) found — "
        f"merge/shuffle_hash-hint the join at the operator: {flagged}"
    )


def test_sweep_reports_build_errors_not_vacuous_green(spark, monkeypatch):
    """The vacuous-green class bit this audit twice (r09: the AQE-leaf
    walk reached nothing; the all-builds-errored run printed
    FLAGGED: [] and exited 0) — pin the errors channel end-to-end: a
    registry whose builders crash must surface per-query errors, never
    an empty flag list alone."""
    import importlib

    import audit_static_broadcasts as asb

    # the plans package re-exports a `queries` FUNCTION; get the module
    queries_mod = importlib.import_module(
        "sales_forecast_pyspark_spark.plans.queries"
    )

    class _Boom:
        oracle = None

        @staticmethod
        def builder(spark, sf_dir):
            raise RuntimeError("synthetic build failure")

    monkeypatch.setattr(queries_mod, "QUERIES", {"_boom": _Boom})
    flagged, errors = asb.sweep(spark, SF_SMALL)
    assert flagged == []
    assert errors and errors[0][0] == "_boom"
    assert "synthetic build failure" in errors[0][1]


def test_skip_list_names_registered_queries():
    """A renamed query must not silently fall out of the sweep via a
    stale SKIP entry."""
    assert set(SKIP) <= set(QUERIES), sorted(set(SKIP) - set(QUERIES))
