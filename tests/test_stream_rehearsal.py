"""Pins the streaming-rehearsal harness (scripts/stream_rehearsal.py)
at tiny scale: every measured path must drain, report sane metrics,
and hold its equivalence/exactness gates — otherwise the SCALING.md
streaming tables measure a broken harness. The timed sf0.1 / decade
runs stay script-only; this covers the LOGIC in seconds (the tiny
ingest-loop legs run minutes, not seconds — they build real stores).
"""

from __future__ import annotations

import pytest

from scripts.stream_rehearsal import (
    run_attribution,
    run_partials_fold,
    run_windowed,
)

SF = "/root/testdata/sf0.001"


def test_windowed_path_matches_batch_and_reports_state(spark):
    res = run_windowed(spark, SF, files_per_trigger=1)
    assert res["matches_batch"] is True
    assert res["input_rows"] == 1000
    # aggregation state = window grid (hours x event types), not rows
    assert 0 < res["state_rows"] < res["input_rows"]
    assert res["state_bytes"] > 0


def test_attribution_path_emits_every_conversion_with_per_user_state(spark):
    res = run_attribution(spark, SF, files_per_trigger=1)
    assert res["emits_all_conversions"] is True
    assert res["emitted"] == res["conversions"] > 0
    # applyInPandasWithState: one state tuple per user with >= 1 TOUCH
    # event — anchoring on distinct_users would be a corpus property,
    # not an operator guarantee (a purchase-only user emits rows but
    # leaves no state)
    assert res["state_is_per_touch_user"] is True
    assert res["state_rows"] == res["touch_users"] > 0


def test_partials_fold_matches_batch_rebuild(spark):
    res = run_partials_fold(spark, SF, files_per_trigger=1)
    assert res["matches_batch_rebuild"] is True
    assert res["input_rows"] == 6000
    assert res["state_rows"] > 0  # published panel grain


@pytest.mark.slow
def test_semantic_ingest_path_is_exact_at_tiny_scale(spark):
    """The semantic-dedup rehearsal leg (VERDICT r13 ask #3) at sf0.001:
    every re-keyed exact dup screens out, every hash-random fresh
    vector survives, and the isolated 500-vector screen flags all its
    exact copies."""
    from scripts.stream_rehearsal import run_semantic_ingest

    res = run_semantic_ingest(spark, SF, files_per_trigger=1)
    assert res["semantic_exactness"] is True
    assert res["survivors"] == res["incoming_fresh"] > 0
    assert res["screen_hits"] == res["screen_batch"] == 500
    assert res["screen_s"] > 0 and res["build_s"] > 0
    assert res["inc_batches"] == res["n_batches"] > 0


@pytest.mark.slow
def test_ingest_all_path_is_exact_at_tiny_scale(spark):
    """The composed-triad rehearsal leg (VERDICT r13 ask #6) at
    sf0.001: every engineered class lands on exactly its own verdict —
    exact copies on exact_dup (stage 1), doubled-text rows on text_dup
    (stage 2, never stage 1: md5 differs by construction), verbatim
    embedding copies on semantic_dup (stage 3), fresh rows admitted —
    and every store shows the drained batch increments."""
    from scripts.stream_rehearsal import run_ingest_all

    res = run_ingest_all(spark, SF, files_per_trigger=1)
    assert res["triad_exactness"] is True, res["class_counts"]
    n = res["per_class"]
    assert n > 0 and res["input_rows"] == 4 * n
    assert res["class_counts"] == {
        "3:exact_dup": n,
        "2:text_dup": n,
        "1:semantic_dup": n,
        "0:admitted": n,
    }
    assert res["inc_batches"] == 3 * res["n_batches"] > 0
    assert res["build_s"] > 0 and res["wall_s"] > 0
    # VERDICT r14 ask #6: post-drain cross-store agreement rides the
    # rehearsal JSON — the engineered corpus has no zero-norm vectors,
    # so the strict verdict must hold too
    assert res["triad_consistent"] is True
    assert res["strict_consistent"] is True


def test_dedup_screen_ratio_path_reports_sane_metrics(spark):
    """The reproducible screen-vs-reshingle measurement (VERDICT r12
    ask #5): every re-keyed batch doc is an exact copy of a store doc,
    so the screen must flag all 500, and both timing sides must be
    positive with a positive ratio."""
    from scripts.stream_rehearsal import run_dedup_screen_ratio

    res = run_dedup_screen_ratio(spark, SF, files_per_trigger=1)
    assert res["corpus_docs"] > 0 and res["batch_docs"] == 500
    assert res["screen_hits"] >= 500
    assert res["screen_s"] > 0 and res["oneshot_s"] > 0
    assert res["ratio"] == round(res["oneshot_s"] / res["screen_s"], 2)
