"""Persisted MinHash signature store: incremental near-dedup at
ingest cadence.

``minhash_near_dedup`` re-signatures the ENTIRE corpus on every call —
right for a one-shot sweep, wrong for the production shape where a
~100 TB corpus grows batch by batch and each new batch must be screened
against everything already accepted. This module persists the LSH state
once and lets every subsequent batch pay only for itself (the near-dup
analogue of ``ann_index.py``'s build-once/serve-many split; the exact-
fingerprint analogue is the ``incremental_ingest_dedup`` registered
row):

- ``build_minhash_store(df, path, ...)`` signs the seed corpus with the
  SAME signature pipeline as ``minhash_near_dedup`` (shared
  ``_minhash_signatures`` / ``_band_buckets`` helpers — identical text
  ⇒ identical signatures, test-pinned) and writes four tables:

  | table | contents | layout rationale |
  |---|---|---|
  | ``signatures`` | (doc_id, sig array<long>, src_batch) | the estimate-verify surface — candidate pairs re-score from stored signatures, the corpus TEXT is never re-read |
  | ``buckets`` | (doc_id, band, bucket, src_batch) | the join surface: screening is a (band, bucket) equality join, never all-pairs |
  | ``fingerprints`` | (doc_id, fp, src_batch) | the exact-dup surface for ZERO-TOKEN docs (empty/whitespace/punctuation-only text): they produce no shingles, hence no signature, so without this tier repeated exact copies would survive every batch forever (ADVICE r12). fp is the oracle-reproducible ``fingerprint_expr`` md5; screening is an fp equality join |
  | ``meta`` | (n, num_hashes, bands, n_docs) | geometry contract — a screen/append always derives its hashing from the store, so mixed-geometry signatures cannot collide silently |

- ``screen_against_minhash_store(batch, path, ...)`` signs the batch
  with the store's geometry, joins batch buckets against store buckets,
  and verifies candidates with the SIGNATURE-ESTIMATE Jaccard (fraction
  of agreeing min-hashes — the standard unbiased estimator; stderr
  ≈ √(j(1−j)/num_hashes), ~0.09 at 32 hashes, so thresholds are
  screening gates, not exact measures — raise ``num_hashes`` at build
  time to tighten; NOTE the one-shot ``minhash_near_dedup`` verifies
  with EXACT shingle Jaccard instead, so the same threshold draws a
  slightly different accept boundary when migrating a pipeline to the
  store — exact re-verification against STORE docs is impossible by
  design, their text is never retained). Zero-token batch docs are
  screened through the fingerprint tier (exact match ⇒ est_jaccard
  1.0). Returns (doc_id, dup_of, n_agree, est_jaccard) for batch docs
  whose estimate clears the threshold.

- ``append_to_minhash_store(df, path, batch_id=None)`` admits accepted
  docs (signatures+buckets for token-bearing docs, fingerprints for
  zero-token docs). With ``batch_id`` the append is IDEMPOTENT
  (overwrite-mode increment dirs ``signatures_inc/b=<id>`` /
  ``buckets_inc/b=<id>`` / ``fingerprints_inc/b=<id>``, same
  versioned-increments design as the IVF-PQ index), and every row
  carries ``src_batch`` — which is what makes the composed ingest loop
  replay-safe: a replayed batch screens with ``exclude_batch=<its own
  id>`` so it can never be screened out by its OWN first attempt.

- ``stream_ingest_dedup(stream_df, path, survivors_dir, checkpoint)``
  is the composed loop: per micro-batch, screen → drop in-batch dups
  under EXACT sequential-greedy semantics (see ``_greedy_losers``) →
  append survivors to the store → publish survivors to
  ``survivors_dir/b=<id>`` (overwrite — idempotent). Exactly-once end
  to end without a transactional sink, by the same argument as
  ``stream_append_to_ivfpq_index``.

Every mutating entry point (build / append / compact) takes the
store's single-maintainer lease (``lsm.maintenance_lease``), so the
no-ingest-concurrent-with-compaction rule is enforced — a concurrent
mutation fails loudly at acquire instead of corrupting (VERDICT r12
ask #4a).

At 100 TB: screening cost is |batch| signature builds + a bucket-key
equality join against a bucketed/partitioned store + |candidates|
signature comparisons — nothing rescans the corpus text; the store
grows by kilobytes of signature per accepted doc. Banding recall is
the standard 1-(1-j^r)^b curve (steep near j≈0.5 at 32/8 defaults):
a true near-dup pair is missed with probability (1-j^r)^b, the
documented trade every LSH dedup makes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_forecast_pyspark_spark.llmdata.dedup import (
    _band_buckets,
    _exploded_shingles,
    _jaccard_on_pairs,
    _minhash_signatures,
    fingerprint_expr,
)
from sales_forecast_pyspark_spark.llmdata.lsm import DEFAULT_TARGET_FILE_MB
from sales_forecast_pyspark_spark.llmdata.text import tokens_expr


def _sig_frame(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
) -> DataFrame:
    """(doc_id, sig array<long>) for the input docs — the array form
    the store persists (column-count independent of geometry)."""
    sh = _exploded_shingles(df, id_col, text_col, n)
    sig = _minhash_signatures(sh, id_col, num_hashes)
    return sig.select(
        F.col(id_col).alias("doc_id"),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def _sig_cols(sig_arr: DataFrame, num_hashes: int) -> DataFrame:
    """Back from the stored array form to h0..h{k-1} columns (what the
    shared banding helper consumes)."""
    return sig_arr.select(
        "doc_id",
        *[F.col("sig")[i].alias(f"h{i}") for i in range(num_hashes)],
    )


def _zero_token_fps(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, fp) for the docs that CANNOT be signed: zero-token text
    produces no shingles (the ``_exploded_shingles`` filter — any doc
    with ≥1 token gets ≥1 shingle via the short-doc whole-join rule in
    ``shingles_expr``, so zero tokens is EXACTLY the no-signature
    class). These route through the exact-fingerprint tier instead of
    silently bypassing the store (ADVICE r12)."""
    return df.where(F.size(tokens_expr(text_col)) == 0).select(
        F.col(id_col).alias("doc_id"),
        fingerprint_expr(text_col).alias("fp"),
    )


def _read_store_table(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Base ∪ batch-versioned increments — the shared LSM reader
    (``llmdata/lsm.py``), identical to the IVF-PQ index's."""
    from sales_forecast_pyspark_spark.llmdata import lsm

    return lsm.read_tiered(spark, path, table)


def _read_store_fps(
    spark: SparkSession, path: str, id_dtype: str
) -> DataFrame:
    """The fingerprints tier, tolerating absence on EITHER side: a
    store built from a corpus with no zero-token docs has no base
    table, yet a later streamed batch may have written increments."""
    from sales_forecast_pyspark_spark.llmdata import lsm

    return lsm.read_tiered_opt(
        spark, path, "fingerprints",
        f"doc_id {id_dtype}, fp string, src_batch long",
    )


def _doc_count(spark: SparkSession, path: str) -> int:
    """Total admitted docs from the kilobyte ``doc_counts`` ledger —
    one row per build/append, additive and replay-idempotent (versioned
    appends overwrite their own ``doc_counts_inc/b=<id>`` row). The
    alternative — counting the signatures table — is an O(files) job
    per batch, the exact pattern ann_index.py rejects for
    ``meta.n_vectors`` (code-review r12)."""
    from sales_forecast_pyspark_spark.llmdata import lsm

    return int(
        lsm.read_tiered(spark, path, "doc_counts")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("t"))
        .first()["t"]
    )


def build_minhash_store(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> dict:
    """Sign the seed corpus and persist the store under ``path``.
    Returns the meta dict (also stored). Seed rows carry
    ``src_batch = -1`` (pre-stream provenance). Zero-token seed docs
    land in the fingerprints tier; ``n_docs`` counts BOTH classes."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands "
            f"({bands}); leftover hashes would be silently dropped"
        )
    from sales_forecast_pyspark_spark.llmdata import lsm

    spark = df.sparkSession
    with lsm.maintenance_lease(spark, path, "build"):
        # rebuild-in-place starts from a clean tier map: drop any prior
        # incarnation's increment dirs and fold ledger
        for t in ("signatures", "buckets", "fingerprints", "doc_counts"):
            lsm.drop_inc(spark, path, t)
        lsm.drop_ledger(spark, path)
        sig = _sig_frame(df, id_col, text_col, n, num_hashes)
        sig.cache()
        n_signed = sig.count()
        sig.withColumn("src_batch", F.lit(-1).cast("long")).write.mode(
            "overwrite"
        ).parquet(os.path.join(path, "signatures"))
        (
            _band_buckets(
                _sig_cols(sig, num_hashes), "doc_id", num_hashes, bands
            )
            .withColumn("src_batch", F.lit(-1).cast("long"))
            .write.mode("overwrite")
            .parquet(os.path.join(path, "buckets"))
        )
        sig.unpersist()
        fps = _zero_token_fps(df, id_col, text_col)
        n_fp = fps.count()
        if n_fp:
            fps.withColumn("src_batch", F.lit(-1).cast("long")).write.mode(
                "overwrite"
            ).parquet(os.path.join(path, "fingerprints"))
        else:
            # no zero-token docs: clear any stale tier from a prior
            # incarnation (an empty overwrite would leave a
            # schema-less, unreadable directory instead)
            lsm.drop_dir(spark, path, "fingerprints")
        n_docs = n_signed + n_fp
        spark.createDataFrame(
            [(n_docs, -1)], "n long, src_batch long"
        ).write.mode("overwrite").parquet(os.path.join(path, "doc_counts"))
        meta = {
            "n": n,
            "num_hashes": num_hashes,
            "bands": bands,
            "n_docs": n_docs,
        }
        spark.createDataFrame(
            [tuple(meta.values())],
            "n int, num_hashes int, bands int, n_docs long",
        ).write.mode("overwrite").parquet(os.path.join(path, "meta"))
        return meta


def screen_against_minhash_store(
    batch: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    exclude_batch: int | None = None,
) -> DataFrame:
    """Which batch docs are near-dups of docs ALREADY IN THE STORE?
    Signs the batch with the store's geometry (meta-derived — callers
    cannot desynchronize hashing), candidates via the (band, bucket)
    equality join, verification via signature-estimate Jaccard over
    the stored arrays; zero-token batch docs are screened by exact
    fingerprint instead (match ⇒ n_agree=num_hashes, est_jaccard=1.0).
    Returns (doc_id, dup_of, n_agree, est_jaccard) with est_jaccard ≥
    threshold; a doc matching several store docs returns several rows
    (callers typically care about existence).

    ``exclude_batch`` ignores store rows whose ``src_batch`` equals
    the given id — the replay guard: a re-delivered micro-batch must
    not be screened out by the survivors its own first attempt
    appended. Cost: |batch|-proportional signing + one equality join;
    the corpus text is never read."""
    spark = batch.sparkSession
    meta = spark.read.parquet(os.path.join(path, "meta")).first().asDict()
    # deliberately NOT cached: the returned frame is lazy, so a cache
    # here could never be unpersisted and a long-lived driver screening
    # many batches would accrete one pinned frame per call (code-review
    # r12). The cost is signing the batch twice inside the one action —
    # batches are small by contract; the streaming loop, which screens
    # at cadence, uses _screen_signed with an explicitly managed cache.
    bsig = _sig_frame(batch, id_col, text_col, meta["n"], meta["num_hashes"])
    sig_hits = _screen_signed(spark, path, bsig, meta, threshold, exclude_batch)
    fp_hits = _screen_fps(
        spark,
        path,
        _zero_token_fps(batch, id_col, text_col),
        meta["num_hashes"],
        exclude_batch,
    )
    return sig_hits.unionByName(fp_hits)


def _screen_signed(
    spark: SparkSession,
    path: str,
    bsig: DataFrame,
    meta: dict,
    threshold: float,
    exclude_batch: int | None,
) -> DataFrame:
    """Screening body over an ALREADY-SIGNED batch — split out so the
    streaming loop can sign a micro-batch once and reuse the cached
    signatures for both the store screen and the in-batch dedup
    (and unpersist them when the batch completes)."""
    num_hashes, bands = meta["num_hashes"], meta["bands"]
    b_buckets = _band_buckets(
        _sig_cols(bsig, num_hashes), "doc_id", num_hashes, bands
    )

    s_buckets = _read_store_table(spark, path, "buckets")
    s_sigs = _read_store_table(spark, path, "signatures")
    if exclude_batch is not None:
        s_buckets = s_buckets.filter(F.col("src_batch") != int(exclude_batch))
        s_sigs = s_sigs.filter(F.col("src_batch") != int(exclude_batch))

    # bucket-key equality join, merge-hinted for the same reason as
    # minhash_near_dedup: both sides sit behind signature aggs +
    # band explodes, so static size fiction must not pick an
    # un-demotable broadcast
    cand = (
        b_buckets.select(F.col("doc_id"), "band", "bucket")
        .join(
            s_buckets.select(
                F.col("doc_id").alias("dup_of"), "band", "bucket"
            ).hint("merge"),
            ["band", "bucket"],
        )
        .select("doc_id", "dup_of")
        .distinct()
    )
    # estimate-verify from signatures: fraction of agreeing min-hashes
    agree = F.size(
        F.filter(
            F.zip_with("sig", "store_sig", lambda a, b: a == b),
            lambda x: x,
        )
    )
    return (
        cand.join(bsig, "doc_id")
        .join(
            s_sigs.select(
                F.col("doc_id").alias("dup_of"),
                F.col("sig").alias("store_sig"),
            ).hint("merge"),
            "dup_of",
        )
        .select(
            "doc_id",
            "dup_of",
            agree.alias("n_agree"),
            F.round(agree / F.lit(num_hashes), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


def _screen_fps(
    spark: SparkSession,
    path: str,
    ufps: DataFrame,
    num_hashes: int,
    exclude_batch: int | None,
) -> DataFrame:
    """Exact-fingerprint screen for the zero-token tier: an fp equality
    join against the store's fingerprints. A match is an exact copy of
    an admitted doc, reported in the screen's common row shape with
    the values an exact match implies (all hashes agree)."""
    store = _read_store_fps(spark, path, dict(ufps.dtypes)["doc_id"])
    if exclude_batch is not None:
        store = store.filter(F.col("src_batch") != int(exclude_batch))
    return ufps.join(
        store.select(F.col("doc_id").alias("dup_of"), "fp"), "fp"
    ).select(
        "doc_id",
        "dup_of",
        F.lit(num_hashes).alias("n_agree"),
        F.lit(1.0).alias("est_jaccard"),
    )


def append_to_minhash_store(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_id: int | None = None,
    lease_retry_s: float = 0.0,
) -> int:
    """Admit accepted docs into the store (sign with the store's
    geometry, append signatures + buckets; zero-token docs append
    fingerprints). With ``batch_id`` the write is IDEMPOTENT —
    overwrite-mode increment dirs keyed by the batch, so foreachBatch
    replays overwrite themselves — and rows carry the batch as
    ``src_batch`` for the screen-time replay guard. Returns the number
    of docs admitted (both classes). ``meta.n_docs`` derives from the
    kilobyte ``doc_counts`` ledger (see ``_doc_count``), correct under
    replays and O(ledger) per batch."""
    spark = df.sparkSession
    meta = spark.read.parquet(os.path.join(path, "meta")).first().asDict()
    sig = _sig_frame(df, id_col, text_col, meta["n"], meta["num_hashes"])
    sig.cache()
    n_new = _append_signed(
        spark, sig, path, meta, batch_id,
        fps=_zero_token_fps(df, id_col, text_col),
        lease_retry_s=lease_retry_s,
    )
    sig.unpersist()
    return n_new


def _append_signed(
    spark: SparkSession,
    sig: DataFrame,
    path: str,
    meta: dict,
    batch_id: int | None,
    fps: DataFrame | None = None,
    lease_retry_s: float = 0.0,
) -> int:
    """Append body over an ALREADY-SIGNED (doc_id, sig) frame — split
    out so the streaming loop can admit survivors from the signatures
    it already computed for screening, instead of re-shingling the
    surviving text a second time. ``fps`` carries the zero-token
    survivors' (doc_id, fp) rows for the fingerprint tier. Takes the
    store's single-maintainer lease for the duration of the writes;
    ``lease_retry_s`` bounds a wait at acquire so streaming callers
    outlast an external cron fold instead of crashing (ADVICE r13)."""
    from sales_forecast_pyspark_spark.llmdata import lsm

    with lsm.maintenance_lease(spark, path, "append", retry_s=lease_retry_s):
        # replay-after-fold guard (code-review r12, same as the IVF-PQ
        # index): a batch a past compaction already folded into the base
        # must not re-append — its rows are in the base (with src_batch
        # provenance preserved), only its increment dirs are gone
        if batch_id is not None and int(batch_id) in lsm.folded_batches(
            spark, path
        ):
            return 0
        num_hashes, bands = meta["num_hashes"], meta["bands"]
        n_sig = sig.count()
        src = -1 if batch_id is None else int(batch_id)
        if batch_id is None:
            sig_dst = os.path.join(path, "signatures")
            bkt_dst = os.path.join(path, "buckets")
            fp_dst = os.path.join(path, "fingerprints")
            mode = "append"
        else:
            sig_dst = os.path.join(path, "signatures_inc", f"b={int(batch_id)}")
            bkt_dst = os.path.join(path, "buckets_inc", f"b={int(batch_id)}")
            fp_dst = os.path.join(
                path, "fingerprints_inc", f"b={int(batch_id)}"
            )
            mode = "overwrite"
        # signatures before buckets: an orphan signature row (torn
        # append) is never joined as a candidate, while an orphan bucket
        # row would produce candidates whose verify join silently drops
        # them; fingerprints third, doc_counts LAST — presence of a
        # batch's doc_counts row is the compactor's completeness test
        # Sized writes, compactor layout (r15, guide small-files): an
        # unsized batch append emitted one file per input partition and
        # table — ~3 × |partitions| files per micro-batch that every
        # later screen lists and opens until a fold. Rows-based byte
        # estimates; the compactor re-sizes from real bytes at fold.
        target_bytes = DEFAULT_TARGET_FILE_MB * 1024 * 1024
        n_sig_files = max(
            1, -(-(n_sig * (24 + 8 * num_hashes)) // target_bytes)
        )
        n_bkt_files = max(1, -(-(n_sig * bands * 40) // target_bytes))
        (
            sig.select("doc_id", "sig")
            .withColumn("src_batch", F.lit(src).cast("long"))
            .repartitionByRange(int(n_sig_files), "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode(mode)
            .parquet(sig_dst)
        )
        (
            _band_buckets(_sig_cols(sig, num_hashes), "doc_id", num_hashes, bands)
            .withColumn("src_batch", F.lit(src).cast("long"))
            .repartitionByRange(int(n_bkt_files), "band", "bucket")
            .sortWithinPartitions("band", "bucket")
            .write.mode(mode)
            .parquet(bkt_dst)
        )
        n_fp = 0
        if fps is not None:
            n_fp = fps.count()
            if n_fp:
                n_fp_files = max(1, -(-(n_fp * 64) // target_bytes))
                fps.select("doc_id", "fp").withColumn(
                    "src_batch", F.lit(src).cast("long")
                ).repartition(int(n_fp_files)).write.mode(mode).parquet(fp_dst)
        n_new = n_sig + n_fp
        # fold this batch's count into the kilobyte ledger (versioned →
        # its own overwrite-idempotent row; ad-hoc → base append), then
        # derive n_docs from the ledger — O(ledger), not O(files)
        if batch_id is None:
            spark.createDataFrame(
                [(n_new, -1)], "n long, src_batch long"
            ).write.mode("append").parquet(os.path.join(path, "doc_counts"))
        else:
            spark.createDataFrame(
                [(n_new, int(batch_id))], "n long, src_batch long"
            ).write.mode("overwrite").parquet(
                os.path.join(path, "doc_counts_inc", f"b={int(batch_id)}")
            )
        meta = dict(meta)
        meta["n_docs"] = _doc_count(spark, path)
        spark.createDataFrame(
            [tuple(meta.values())],
            "n int, num_hashes int, bands int, n_docs long",
        ).write.mode("overwrite").parquet(os.path.join(path, "meta"))
        return n_new


def _greedy_losers(pairs: DataFrame, max_rounds: int = 64) -> DataFrame:
    """The docs a SEQUENTIAL greedy first-wins ingest would drop, given
    the verified near-dup pairs of one batch: processing docs in
    ascending id order, a doc is dropped iff it verifies against an
    already-KEPT smaller doc. On the pair graph this is the complement
    of the lexicographically-first maximal independent set — dropping
    doc_b of EVERY verified pair over-deletes on non-transitive chains
    (a~b, b~c, a≁c: b loses to a, so sequential ingest KEEPS c — its
    only near-dup was never admitted; ADVICE r12).

    Computed by iterative peeling: each round, docs that appear only
    on the small side of remaining pairs are definitively KEPT (their
    smaller partners are all decided losers or nonexistent), their
    partners are decided LOSERS, and pairs touching a decided loser
    vacate. The minimum id in the remaining graph only ever appears as
    ``doc_a`` (pairs are ordered doc_a < doc_b), so every round decides
    at least one pair — termination in ≤ longest-dependency-chain
    rounds, which is 1 for the common planted-dup case. Round frames
    are id-only and eagerly localCheckpointed: lineage stays flat
    across rounds instead of stacking one join tree per iteration.

    Round bound: realistic near-dup structure peels in one or two
    rounds (exact-copy families are cliques — one round; planted
    mutation families are stars), but an adversarial PATH graph
    1-2-3-…-n decides only two nodes per round, so an unbounded loop
    could spin O(n) driver rounds on one poisoned batch. After
    ``max_rounds`` the remaining (cyclic-free but deep) tail falls
    back to dropping every remaining ``doc_b`` — the pre-r13
    semantics: possibly over-deleting on the tail, NEVER keeping two
    verified near-dups together, and loudly warned.

    Input must be DISTINCT (doc_a, doc_b) rows with doc_a < doc_b;
    output is a (doc_id) frame of losers."""
    import warnings

    active = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
    losers = (
        active.select(F.col("doc_b").alias("doc_id"))
        .limit(0)
        .localCheckpoint(eager=True)
    )
    rounds = 0
    while not active.isEmpty():
        if rounds >= max_rounds:
            warnings.warn(
                f"_greedy_losers: dependency chains deeper than "
                f"{max_rounds} rounds — dropping every remaining pair's "
                f"doc_b (conservative over-deletion on the tail)",
                stacklevel=2,
            )
            losers = losers.unionByName(
                active.select(F.col("doc_b").alias("doc_id")).distinct()
            ).localCheckpoint(eager=True)
            break
        rounds += 1
        kept = active.select("doc_a").distinct().join(
            active.select(F.col("doc_b").alias("doc_a")).distinct(),
            "doc_a",
            "left_anti",
        )
        new_losers = (
            active.join(kept, "doc_a")
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        losers = losers.unionByName(new_losers).localCheckpoint(eager=True)
        active = (
            active.join(
                new_losers.select(F.col("doc_id").alias("doc_a")),
                "doc_a",
                "left_anti",
            )
            .join(
                new_losers.select(F.col("doc_id").alias("doc_b")),
                "doc_b",
                "left_anti",
            )
            .localCheckpoint(eager=True)
        )
    return losers


def _verified_in_batch_pairs(
    bsig: DataFrame, meta: dict, threshold: float
) -> DataFrame:
    """DISTINCT verified (doc_a < doc_b) near-dup pairs WITHIN one
    signed batch: bucket-mate candidates, signature-estimate verify —
    the in-batch mirror of ``_screen_signed``."""
    bb = _band_buckets(
        _sig_cols(bsig, meta["num_hashes"]),
        "doc_id",
        meta["num_hashes"],
        meta["bands"],
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x
        )
    )
    return (
        bb.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
        .join(
            bb.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
            .hint("merge"),
            ["band", "bucket"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .join(
            bsig.select(
                F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")
            ),
            "doc_a",
        )
        .join(
            bsig.select(
                F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")
            ),
            "doc_b",
        )
        .filter(agree / F.lit(meta["num_hashes"]) >= threshold)
        .select("doc_a", "doc_b")
    )


def stream_ingest_dedup(
    stream_df: DataFrame,
    path: str,
    survivors_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    exact_verify_in_batch: bool = False,
    auto_compact_after: int | None = 64,
    lease_retry_s: float = 600.0,
):
    """The composed incremental-dedup ingest loop: per micro-batch,
    (1) screen the batch against everything already accepted (signature
    estimate for token-bearing docs, exact fingerprint for zero-token
    docs), (2) drop in-batch dups under EXACT sequential-greedy
    semantics — store-dropped docs are removed from the pair graph
    first (a doc that was never admitted cannot defeat a later one),
    then ``_greedy_losers`` peels the verified pairs so non-transitive
    chains keep exactly what one-at-a-time ingest would keep —
    (3) append the survivors to the store, (4) publish the surviving
    rows to ``survivors_dir/b=<batch_id>``.

    ``threshold`` note: in-batch and store verification both use the
    SIGNATURE-ESTIMATE Jaccard (~0.09 stderr at the default 32 hashes)
    — the same doc pair can land on the other side of the threshold
    than the one-shot ``minhash_near_dedup``'s exact verify would put
    it. ``exact_verify_in_batch=True`` re-checks the in-batch pairs
    with exact shingle Jaccard from the batch text before the peel
    (store-side candidates cannot be exact-checked: admitted text is
    never retained — raise ``num_hashes`` at build time instead).

    ``auto_compact_after=N`` (default 64) makes the loop consult
    ``lsm.should_compact`` after each append and fold the increments
    tier once any table accumulates N batch dirs — long-running ingest
    bounds its own listing costs instead of relying on an operator
    hand-scheduling ``compact_minhash_store`` (VERDICT r12 ask #4b).
    ``None`` disables (rehearsals comparing tier depth use that); the
    fold runs inside this same single-writer loop, so the maintenance
    lease never contends. ``lease_retry_s`` (ADVICE r13, default
    10 min) bounds a retry-with-backoff wait when an EXTERNAL cron
    maintainer holds the lease between micro-batches — the append
    delays instead of crashing the StreamingQuery; fail-fast stays the
    backstop past the budget.

    Exactly-once end to end without a transactional sink: the store
    append and the survivors publish are both overwrite-mode keyed by
    batch_id (replays overwrite themselves), and the screen excludes
    the current batch's own ``src_batch`` rows, so a replayed batch is
    judged ONLY against prior state — the same verdict as its first
    attempt, bit-for-bit (test-pinned). Uses availableNow (drain, then
    stop); returns the started StreamingQuery."""

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        from sales_forecast_pyspark_spark.llmdata import lsm

        spark = batch_df.sparkSession
        batch_df = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        batch_df.cache()
        # sign the micro-batch ONCE; the same cached signatures feed
        # the store screen, the in-batch dedup, AND the survivor
        # admission (no re-shingling, and unpersisted when the batch
        # completes — no cache accretion across thousands of batches)
        meta = spark.read.parquet(os.path.join(path, "meta")).first().asDict()
        bsig = _sig_frame(
            batch_df, "doc_id", "text", meta["n"], meta["num_hashes"]
        )
        bsig.cache()
        unsigned = _zero_token_fps(batch_df, "doc_id", "text")
        unsigned.cache()
        # (1) dups of the accepted corpus (own batch excluded — the
        # replay guard): signature route + zero-token fingerprint route
        dup_of_store = (
            _screen_signed(spark, path, bsig, meta, threshold, batch_id)
            .select("doc_id")
            .unionByName(
                _screen_fps(
                    spark, path, unsigned, meta["num_hashes"], batch_id
                ).select("doc_id")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        # (2a) in-batch near-dups among signed docs, sequential-greedy.
        # Store-dropped docs leave the pair graph BEFORE the peel: they
        # were never admitted, so sequential ingest never screens a
        # later doc against them.
        pairs = _verified_in_batch_pairs(bsig, meta, threshold)
        if exact_verify_in_batch:
            sh = _exploded_shingles(
                batch_df, "doc_id", "text", meta["n"]
            )
            pairs = _jaccard_on_pairs(sh, pairs, "doc_id", threshold).select(
                "doc_a", "doc_b"
            )
        pairs = pairs.join(
            dup_of_store.select(F.col("doc_id").alias("doc_a")),
            "doc_a",
            "left_anti",
        ).join(
            dup_of_store.select(F.col("doc_id").alias("doc_b")),
            "doc_b",
            "left_anti",
        )
        in_batch_losers = _greedy_losers(pairs)
        # (2b) in-batch exact dups among zero-token docs: first id wins
        # (same-fp docs share the store verdict, so no graph filter is
        # needed — either the whole fp group matched the store or none)
        u_losers = (
            unsigned.join(
                unsigned.groupBy("fp").agg(F.min("doc_id").alias("keep")),
                "fp",
            )
            .filter(F.col("doc_id") != F.col("keep"))
            .select("doc_id")
        )
        survivors = (
            batch_df.join(dup_of_store, "doc_id", "left_anti")
            .join(in_batch_losers, "doc_id", "left_anti")
            .join(u_losers, "doc_id", "left_anti")
        )
        survivors.cache()
        # (3) admit survivors from their ALREADY-COMPUTED signatures /
        # fingerprints, idempotently under this batch id
        _append_signed(
            spark,
            bsig.join(survivors.select("doc_id"), "doc_id"),
            path,
            meta,
            batch_id,
            fps=unsigned.join(survivors.select("doc_id"), "doc_id"),
            lease_retry_s=lease_retry_s,
        )
        # (4) publish — overwrite-mode per batch, idempotent
        survivors.write.mode("overwrite").parquet(
            os.path.join(survivors_dir, f"b={int(batch_id)}")
        )
        survivors.unpersist()
        unsigned.unpersist()
        bsig.unpersist()
        batch_df.unpersist()
        if auto_compact_after is not None and lsm.should_compact(
            spark,
            path,
            ["signatures", "buckets", "fingerprints", "doc_counts"],
            max_inc_batches=auto_compact_after,
        ):
            compact_minhash_store(spark, path)

    return (
        stream_df.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def minhash_store_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-band bucket-load report for a persisted MinHash store — the
    dedup analogue of ``ivfpq_index_stats``: the quantity that degrades
    with corpus growth here is not reconstruction error but SCREENING
    LOAD — the candidates a new doc draws from the (band, bucket)
    equality join. An INCOMING doc distributed like the corpus lands
    in a bucket of size s with probability s/n and draws all s stored
    members as candidates, so its expected store-side candidates from
    one band are Σ_buckets s²/n (ADVICE r13: the prior Σ s·(s−1)/n was
    the self-excluded EXISTING-doc form and systematically understated
    the load a new batch doc pays, most visibly near the
    ``max_cand_per_doc`` threshold). The estimate upper-bounds novel
    content — a genuinely new doc can land in a fresh bucket and draw
    zero — and is exact for corpus-resembling traffic, the regime that
    densifies. Same collision-mass statistic ``lsh_band_load_ladder``
    samples for the one-shot operators (r12's density-aware banding),
    computed here EXACTLY from the persisted buckets table.

    Output: one row per band — (band, n_buckets, n_rows, max_bucket,
    mean_bucket, cand_per_doc) — ordered by band; total screening load
    per new doc = Σ bands' cand_per_doc. Cost: one hash aggregate over
    the buckets tiers (O(store), maintenance-cadence — run it at fold
    time or from ``should_rescale_bands``; after a fold the base is
    (band, bucket)-sorted so the partial aggregation is row-group
    local). All-singleton buckets ⇒ cand_per_doc 1 per band — a store
    of unrelated docs screens for ~|bands| candidates/doc; a
    duplicate-dense corpus concentrates mass in few buckets and the
    estimate prices the screen's join fan-out before a batch pays
    it."""
    b = _read_store_table(spark, path, "buckets")
    sizes = b.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("s"))
    return (
        sizes.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("s").alias("n_rows"),
            F.max("s").alias("max_bucket"),
            F.round(F.avg("s"), 6).alias("mean_bucket"),
            F.sum(F.col("s") * F.col("s")).alias("_mass"),
        )
        .select(
            "band",
            "n_buckets",
            "n_rows",
            "max_bucket",
            "mean_bucket",
            F.round(
                F.col("_mass") / F.col("n_rows"), 6
            ).alias("cand_per_doc"),
        )
        .orderBy("band")
    )


def should_rescale_bands(
    spark: SparkSession,
    path: str,
    max_cand_per_doc: float = 100.0,
) -> dict:
    """The store's REBUILD verdict, mirroring the index's
    ``should_rebuild``: when the total expected screening load per new
    doc crosses ``max_cand_per_doc``, every future batch pays a
    candidate fan-out the build-time geometry never priced — the
    remedy is rebuilding the store with a wider-AND geometry (raise
    ``bands``' row width via num_hashes/bands at ``build_minhash_store``
    time — the persisted-store form of ``adapt_band_geometry``'s
    density rule). Returns {"rescale": bool, "reason": str,
    "cand_per_doc": float (incoming-doc convention, Σ s²/n per band
    summed over bands), "worst_band": int, "worst_band_load": float,
    "n_docs": int (the store's ADMITTED doc count from the doc_counts
    ledger — both signature and fingerprint tiers; ADVICE r13: the
    prior band-0 row count omitted zero-token docs)}. Cost: one
    O(store) aggregate — run at maintenance cadence, not per batch."""
    rows = minhash_store_stats(spark, path).collect()
    total = float(sum(r["cand_per_doc"] for r in rows))
    worst = max(rows, key=lambda r: r["cand_per_doc"], default=None)
    rescale = total > max_cand_per_doc
    return {
        "rescale": rescale,
        "reason": (
            f"expected screen candidates/doc {total:.1f} > "
            f"{max_cand_per_doc} — widen AND-rows at rebuild"
            if rescale
            else "green"
        ),
        "cand_per_doc": round(total, 6),
        "worst_band": worst["band"] if worst else None,
        "worst_band_load": (
            float(worst["cand_per_doc"]) if worst else 0.0
        ),
        "n_docs": _doc_count(spark, path),
    }


def _complete_view(
    spark: SparkSession,
    path: str,
    table: str,
    folding: set[int],
    cols: list[str],
) -> DataFrame:
    """Base ∪ COMPLETE increment batches only — what a fold may absorb.
    A TORN batch (some tables written, ``doc_counts`` not) must stay
    OUT of the fold and keep its increment dirs: folding it would count
    rows the ledger never saw, and its eventual replay would then
    re-append them — the transient double-count window ADVICE r12
    flagged. Left in place, the replay overwrites the torn dirs into a
    complete batch and the NEXT fold absorbs it exactly once. At least
    one tier must exist (callers guard); column types come from the
    parquet schema, never hardcoded."""
    from pyspark.errors import AnalysisException

    parts = []
    try:
        parts.append(
            spark.read.parquet(os.path.join(path, table)).select(*cols)
        )
    except AnalysisException:
        pass
    try:
        parts.append(
            spark.read.parquet(os.path.join(path, f"{table}_inc"))
            .filter(F.col("src_batch").isin([int(b) for b in folding]))
            .select(*cols)
        )
    except AnalysisException:
        pass
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_minhash_store(
    spark: SparkSession,
    path: str,
    target_file_mb: int = DEFAULT_TARGET_FILE_MB,
) -> dict:
    """Fold the batch-versioned increments into the base tables — the
    LSM merge for the signature store, same role and same crash
    posture as ``compact_ivfpq_index``: after thousands of streamed
    batches the per-batch increment dirs dominate listing cost, so
    maintenance folds them into size-targeted base files (buckets
    re-sorted by (band, bucket) for row-group locality on the join
    key; signatures by doc_id). Dedupe on the declared keys
    ((doc_id, band, bucket) / doc_id) makes a crashed prior fold
    self-heal on re-run; ``src_batch`` provenance is PRESERVED so the
    replay guard keeps working for any batch id that could still be
    re-delivered. Only COMPLETE batches fold (see ``_complete_view``);
    a torn batch's increment dirs survive the fold untouched so its
    replay completes it. Holds the single-maintainer lease for the
    duration — concurrent ingest fails loudly at acquire instead of
    losing a batch in the fold's read→delete window. Returns
    {table: (files_before, files_after)}."""
    from sales_forecast_pyspark_spark.llmdata import lsm

    with lsm.maintenance_lease(spark, path, "compact") as lease_token:
        target_bytes = target_file_mb * 1024 * 1024
        # COMPLETE batches only (lsm.record_folded's contract):
        # presence in doc_counts_inc — the LAST table the append
        # writes — implies the batch's signatures, buckets and
        # fingerprints landed too
        folding = lsm.list_inc_batches(spark, path, "doc_counts")
        out = {}

        sig_path = os.path.join(path, "signatures")
        before_sig = lsm.tier_files(spark, path, "signatures")
        sig_bytes = lsm.tier_bytes(spark, path, "signatures")
        n_sig_files = max(1, -(-sig_bytes // target_bytes))
        sigs = _complete_view(
            spark, path, "signatures", folding,
            ["doc_id", "sig", "src_batch"],
        ).dropDuplicates(["doc_id"])

        def _write_sigs(tmp):
            (
                sigs.repartitionByRange(int(n_sig_files), "doc_id")
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .parquet(tmp)
            )

        lsm.swap_dir(spark, path, "signatures", _write_sigs)

        bkt_path = os.path.join(path, "buckets")
        before_bkt = lsm.tier_files(spark, path, "buckets")
        bkt_bytes = lsm.tier_bytes(spark, path, "buckets")
        n_bkt_files = max(1, -(-bkt_bytes // target_bytes))
        bkts = _complete_view(
            spark, path, "buckets", folding,
            ["doc_id", "band", "bucket", "src_batch"],
        ).dropDuplicates(["doc_id", "band", "bucket"])

        def _write_bkts(tmp):
            (
                bkts.repartitionByRange(int(n_bkt_files), "band", "bucket")
                .sortWithinPartitions("band", "bucket")
                .write.mode("overwrite")
                .parquet(tmp)
            )

        lsm.swap_dir(spark, path, "buckets", _write_bkts)

        # fingerprints tier: fold only when there is something COMPLETE
        # to fold (optional table — absent when no zero-token doc was
        # ever admitted; a tier holding only TORN increments is left
        # alone, else the swap would write an empty, unreadable base)
        fp_path = os.path.join(path, "fingerprints")
        before_fp = lsm.tier_files(spark, path, "fingerprints")
        fp_folds = bool(lsm.data_files(spark, fp_path)) or bool(
            lsm.list_inc_batches(spark, path, "fingerprints") & folding
        )
        if fp_folds:
            fps = _complete_view(
                spark, path, "fingerprints", folding,
                ["doc_id", "fp", "src_batch"],
            ).dropDuplicates(["doc_id"])

            def _write_fps(tmp):
                fps.repartition(1).write.mode("overwrite").parquet(tmp)

            lsm.swap_dir(spark, path, "fingerprints", _write_fps)

        # ledger before the increment drops (same crash posture as the
        # index compactor: marked-folded-but-present increments read as
        # transient duplicates the next fold's key dedupe heals); only
        # the FOLDED batch dirs drop — torn ones stay for their replay.
        # FENCE first: if this maintainer stalled past staleness and
        # was taken over, abort here — everything above is key-deduped
        # and self-healing, the increment drop is not
        lsm.verify_lease(spark, path, lease_token)
        lsm.record_folded(spark, path, folding)
        lsm.drop_inc_batches(spark, path, "signatures", folding)
        lsm.drop_inc_batches(spark, path, "buckets", folding)
        lsm.drop_inc_batches(spark, path, "fingerprints", folding)
        out["signatures"] = (before_sig, lsm.data_files(spark, sig_path))
        out["buckets"] = (before_bkt, lsm.data_files(spark, bkt_path))
        if fp_folds:
            out["fingerprints"] = (before_fp, lsm.data_files(spark, fp_path))

        # consolidate the count ledger by RECOUNTING the just-deduped
        # bases (aggregates cannot be deduped by key, so recompute is
        # the self-healing form), and refresh meta.n_docs to agree.
        # Torn batches' rows are NOT in the bases and not in the count
        # — the module invariant: torn state undercounts, never
        # over-claims (their doc_counts row never landed either).
        n_docs = spark.read.parquet(sig_path).count()
        if fp_folds:
            n_docs += spark.read.parquet(fp_path).count()
        # increments before the base overwrite — crash in between reads
        # as an undercount, never a double-count (same ordering rule as
        # the index's stats_live consolidation). Every doc_counts_inc
        # dir belongs to a COMPLETE batch by definition, so all drop.
        lsm.drop_inc(spark, path, "doc_counts")
        spark.createDataFrame(
            [(n_docs, -1)], "n long, src_batch long"
        ).write.mode("overwrite").parquet(os.path.join(path, "doc_counts"))
        meta = spark.read.parquet(os.path.join(path, "meta")).first().asDict()
        meta["n_docs"] = n_docs
        spark.createDataFrame(
            [tuple(meta.values())],
            "n int, num_hashes int, bands int, n_docs long",
        ).write.mode("overwrite").parquet(os.path.join(path, "meta"))
        return out
