"""The composed triad ingest loop (llmdata/ingest.py): the persisted
exact-fingerprint store's lifecycle, stage short-circuit order on a
batch engineered so each dedup class has a distinct witness, and
exactly-once across all three stores under a full replay.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sales_forecast_pyspark_spark.llmdata import (
    append_to_fp_store,
    build_fp_store,
    build_ivfpq_index,
    build_minhash_store,
    compact_fp_store,
    screen_against_fp_store,
    stream_ingest_dedup_all,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def corpus(spark):
    """(doc_id, text, embedding) — documents joined to embeddings on
    the shared id space (both 500 rows at sf0.001)."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    return docs.join(emb, "doc_id").localCheckpoint(eager=True)


def test_fp_store_lifecycle(spark, corpus, tmp_path):
    """Build → screen → versioned append → replay guard → compact for
    the whole-text exact-fingerprint store."""
    path = str(tmp_path / "fp")
    seed = corpus.filter(F.col("doc_id") < 400)
    n = build_fp_store(seed, path)
    assert n == 400
    # exact copy screens out; fresh text passes
    batch = spark.createDataFrame(
        [(9_001, seed.first()["text"]), (9_002, "totally novel words here")],
        "doc_id long, text string",
    )
    hits = screen_against_fp_store(batch, path).collect()
    assert [r["doc_id"] for r in hits] == [9_001]
    # versioned append is idempotent and excluded on replay screens
    fresh = corpus.filter(F.col("doc_id") >= 400).select(
        (F.col("doc_id") + 50_000).alias("doc_id"), "text"
    )
    assert append_to_fp_store(fresh, path, batch_id=3) == 100
    assert append_to_fp_store(fresh, path, batch_id=3) == 100  # overwrite
    from sales_forecast_pyspark_spark.llmdata.ingest import _read_fp_store

    assert _read_fp_store(spark, path).count() == 500
    # replay guard: the batch's own rows are invisible to its screen
    own = screen_against_fp_store(
        fresh, path, exclude_batch=3
    ).count()
    assert own == 0
    seen = screen_against_fp_store(fresh, path).count()
    assert seen == 100
    # compact folds the increments, preserves provenance, and the
    # fold-ledger makes a replayed append a no-op
    out = compact_fp_store(spark, path)
    assert out["fps"][1] >= 1
    store = _read_fp_store(spark, path)
    assert store.count() == 500
    assert store.filter(F.col("src_batch") == 3).count() == 100
    assert append_to_fp_store(fresh, path, batch_id=3) == 0  # folded


@pytest.mark.slow
def test_triad_loop_verdicts_and_exactly_once(spark, corpus, tmp_path):
    """One engineered batch, four dedup classes, each with a distinct
    witness — verdict precedence proves the short-circuit order (an
    exact copy is exact_dup even though the later stages would also
    flag it) — then a full replay (fresh checkpoint) must republish
    bit-identical verdicts and leave every store's counts unchanged."""
    seed = corpus.filter(F.col("doc_id") < 400)
    fp, mh, idx = (
        str(tmp_path / "fp"),
        str(tmp_path / "mh"),
        str(tmp_path / "idx"),
    )
    build_fp_store(seed, fp)
    build_minhash_store(seed, mh)
    build_ivfpq_index(
        seed.select("doc_id", "embedding"), idx, id_col="doc_id"
    )

    r = seed.orderBy("doc_id").limit(3).collect()
    d = len(r[0]["embedding"])
    rand_vec = [((i * 37 % 19) - 9) / 9.0 for i in range(d)]
    rand_vec2 = [((i * 53 % 23) - 11) / 11.0 for i in range(d)]
    batch = spark.createDataFrame(
        [
            # exact copy of an admitted doc (text AND embedding match):
            # must be exact_dup, not text_dup/semantic_dup — the order
            (9_001, r[0]["text"], r[0]["embedding"]),
            # near-dup text (high shingle overlap, different md5) with
            # a fresh random embedding: text_dup
            (9_002, r[1]["text"] + " zzq", rand_vec),
            # fresh text, embedding copied from an admitted doc:
            # semantic_dup
            (9_003, "completely unrelated fresh words qqa", r[2]["embedding"]),
            # fresh on every axis: admitted
            (9_004, "another disjoint novel document wwb", rand_vec2),
            # in-batch exact pair of 9_004's text: first id wins, so
            # 9_005 is exact_dup (in-batch tier), 9_004 admitted
            (9_005, "another disjoint novel document wwb", rand_vec2),
        ],
        f"doc_id long, text string, embedding array<float>",
    )

    src = str(tmp_path / "src")
    batch.coalesce(1).write.parquet(src)

    def run(ckpt):
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .parquet(src)
        )
        q = stream_ingest_dedup_all(
            stream,
            fp,
            mh,
            idx,
            survivors_dir=str(tmp_path / "out"),
            checkpoint_dir=ckpt,
            text_threshold=0.5,
            cos_threshold=0.9,
        )
        q.awaitTermination(300)
        return {
            r["doc_id"]: r["verdict"]
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        }

    verdicts = run(str(tmp_path / "ckpt"))
    assert verdicts == {
        9_001: "exact_dup",
        9_002: "text_dup",
        9_003: "semantic_dup",
        9_004: "admitted",
        9_005: "exact_dup",
    }

    def store_counts():
        from sales_forecast_pyspark_spark.llmdata.dedup_store import (
            _doc_count,
        )
        from sales_forecast_pyspark_spark.llmdata.ingest import (
            _read_fp_store,
        )

        return (
            _read_fp_store(spark, fp).count(),
            _doc_count(spark, mh),
            spark.read.parquet(os.path.join(idx, "meta")).first()[
                "n_vectors"
            ],
        )

    counts = store_counts()
    assert counts == (401, 401, 401)  # seed 400 + the one admitted doc

    # full replay on a fresh checkpoint: same verdicts, same counts —
    # exactly-once across all three stores
    assert run(str(tmp_path / "ckpt2")) == verdicts
    assert store_counts() == counts

    # the admitted doc is screen-visible in every store going forward
    probe_t = spark.createDataFrame(
        [(7_777, "another disjoint novel document wwb")],
        "doc_id long, text string",
    )
    assert screen_against_fp_store(probe_t, fp).count() == 1
    from sales_forecast_pyspark_spark.llmdata import (
        screen_against_ivfpq_index,
    )

    probe_v = spark.createDataFrame(
        [(7_778, rand_vec2)], "vec_id long, embedding array<float>"
    )
    sem = screen_against_ivfpq_index(
        spark, idx, probe_v, threshold=0.9
    ).collect()
    assert any(s["dup_of"] == 9_004 for s in sem)


@pytest.mark.slow
def test_triad_consistency_report_and_fp_maintenance(
    spark, corpus, tmp_path
):
    """The cross-store audit: three freshly seeded stores agree; an fp
    append the siblings never saw flips the verdict; the fp kind of
    the maintenance CLI folds the increment and the report still sees
    the divergence through the compacted base (tiered views, not
    tier layout)."""
    from scripts.store_maintenance import maintain
    from sales_forecast_pyspark_spark.llmdata import (
        triad_consistency_report,
    )

    seed = corpus.filter(F.col("doc_id") < 300)
    fp, mh, idx = (
        str(tmp_path / "fp"),
        str(tmp_path / "mh"),
        str(tmp_path / "idx"),
    )
    build_fp_store(seed, fp)
    build_minhash_store(seed, mh)
    build_ivfpq_index(
        seed.select("doc_id", "embedding"), idx, id_col="doc_id"
    )
    rep = triad_consistency_report(spark, fp, mh, idx)
    assert rep["consistent"] and rep["strict_consistent"]
    assert rep["n_fp"] == rep["n_mh"] == rep["n_index"] == 300
    assert rep["inc_batches"] == {"fp": [], "mh": [], "index": []}

    # an fp-only append (a crashed loop that died between store
    # appends) must flip the verdict: the doc is in fp but nowhere else
    extra = spark.createDataFrame(
        [(8_888, "a document only the fp store ever saw")],
        "doc_id long, text string",
    )
    append_to_fp_store(extra, fp, batch_id=7)
    rep = triad_consistency_report(spark, fp, mh, idx)
    assert not rep["consistent"]
    assert rep["mh_missing"] == 1 and rep["index_missing"] == 1
    assert rep["mh_extra"] == 0 and rep["index_extra"] == 0
    assert rep["inc_batches"]["fp"] == [7]

    # fp maintenance: dry-run reports due without folding, the real
    # run folds, and the report still sees the divergence through the
    # compacted base
    out = maintain(spark, fp, "fp", max_inc_batches=1, dry_run=True)
    assert out["compact_due"] is True and out["compacted"] is False
    assert out["rebuild"] is None and out["recommended_n_probe"] is None
    out = maintain(spark, fp, "fp", max_inc_batches=1)
    assert out["compacted"] is True and out["files"]["fps"][1] >= 1
    rep = triad_consistency_report(spark, fp, mh, idx)
    assert not rep["consistent"]
    assert rep["mh_missing"] == 1 and rep["inc_batches"]["fp"] == []


def test_fp_store_bucketed_base_screen_plan_and_fallback(
    spark, corpus, tmp_path
):
    """VERDICT r14 missing #2: compacting with ``bucket_table=`` writes
    the base fp-bucketed and registers it, and the screen's base-leg
    sort-merge join then shuffles ONLY the batch side (the store side
    arrives pre-partitioned on fp). Results are unchanged, increments
    screen through their own (small) leg, and a later plain compaction
    deregisters the claim so no reader ever trusts stale CLUSTERED-BY
    metadata over unbucketed files."""
    from sales_forecast_pyspark_spark.llmdata.ingest import (
        _fp_bucket_table,
        _read_fp_store,
    )

    path = str(tmp_path / "fpb")
    seed = corpus.filter(F.col("doc_id") < 300)
    build_fp_store(seed, path)
    batch = spark.createDataFrame(
        [(9_001, seed.first()["text"]), (9_002, "nothing like the corpus")],
        "doc_id long, text string",
    )
    plain_hits = {
        (r["doc_id"], r["dup_of"])
        for r in screen_against_fp_store(batch, path).collect()
    }
    assert plain_hits == {(9_001, seed.first()["doc_id"])}

    compact_fp_store(spark, path, bucket_table="t_fp_screen", num_buckets=8)
    try:
        assert _fp_bucket_table(spark, path) == "t_fp_screen"
        assert _read_fp_store(spark, path).count() == 300
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            screened = screen_against_fp_store(batch, path)
            assert {
                (r["doc_id"], r["dup_of"]) for r in screened.collect()
            } == plain_hits
            plan = (
                screened._jdf.queryExecution()
                .executedPlan()
                .toString()
                .split("== Initial Plan ==")[0]  # AQE echoes both plans
            )
            assert "SortMergeJoin" in plan
            assert "Bucketed: true" in plan
            # single-exchange, batch-side-only: the bucketed store scan
            # never re-shuffles
            assert plan.count("Exchange hashpartitioning") == 1
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", old_thresh
            )

        # an appended increment screens through its own leg
        fresh = corpus.filter(
            (F.col("doc_id") >= 300) & (F.col("doc_id") < 350)
        ).select((F.col("doc_id") + 70_000).alias("doc_id"), "text")
        append_to_fp_store(fresh, path, batch_id=11)
        assert screen_against_fp_store(fresh, path).count() == 50
        assert (
            screen_against_fp_store(fresh, path, exclude_batch=11).count()
            == 0
        )

        # plain compaction folds the increment AND drops the claim
        compact_fp_store(spark, path)
        assert _fp_bucket_table(spark, path) is None
        assert not spark.catalog.tableExists("t_fp_screen")
        assert _read_fp_store(spark, path).count() == 350
        assert screen_against_fp_store(fresh, path).count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS t_fp_screen")
        spark.sql("DROP TABLE IF EXISTS t_fp_screen__stage")


@pytest.mark.slow
def test_triad_report_recheck_flag(spark, corpus, tmp_path):
    """ADVICE r14: the report holds no lease, so before reporting
    inconsistency it re-runs once — a clean verdict never rechecks,
    stable divergence rechecks exactly once and still fails."""
    from sales_forecast_pyspark_spark.llmdata import (
        triad_consistency_report,
    )

    seed = corpus.filter(F.col("doc_id") < 200)
    fp, mh, idx = (
        str(tmp_path / "fp"),
        str(tmp_path / "mh"),
        str(tmp_path / "idx"),
    )
    build_fp_store(seed, fp)
    build_minhash_store(seed, mh)
    build_ivfpq_index(
        seed.select("doc_id", "embedding"), idx, id_col="doc_id"
    )
    rep = triad_consistency_report(spark, fp, mh, idx)
    assert rep["strict_consistent"] and rep["rechecked"] is False

    extra = spark.createDataFrame(
        [(7_777, "only the fp store saw this")],
        "doc_id long, text string",
    )
    append_to_fp_store(extra, fp, batch_id=5)
    rep = triad_consistency_report(spark, fp, mh, idx)
    assert not rep["consistent"] and rep["rechecked"] is True
    rep = triad_consistency_report(spark, fp, mh, idx, recheck=False)
    assert not rep["consistent"] and rep["rechecked"] is False


def test_sized_fp_append_writes_one_file_per_small_batch(
    spark, corpus, tmp_path
):
    """r15 layout optimization (guide §6): the fp store's batch-keyed
    increment lands fp-sorted in a byte-sized file count (1 at test
    scale), not one file per input partition."""
    import glob

    def nfiles(p: str) -> int:
        return len(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))

    path = str(tmp_path / "fp_layout")
    build_fp_store(corpus.select("doc_id", "text"), path)
    n = append_to_fp_store(
        corpus.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        .repartition(16),
        path,
        batch_id=1,
    )
    assert n > 0
    assert nfiles(os.path.join(path, "fps_inc")) == 1
