"""Persistent IVF-PQ index: fit ONCE, write to parquet, query MANY.

``ivfpq_topk`` refits its coarse quantizer and codebooks on every call
— right for exploration, wrong for the production shape where a ~100 TB
embedding corpus is encoded once and then served thousands of query
batches. This module splits the operator at its natural seam (the
shared ``_ivfpq_fit`` build stage, similarity.py):

- ``build_ivfpq_index(df, path, ...)`` runs the seeded fit and writes
  four parquet tables under ``path``:

  | table | contents | layout rationale |
  |---|---|---|
  | ``codes`` | (neighbor_id, codes) | ``partitionBy(cell)`` — a query probes n_probe cells, so the scan prunes to n_probe/n_centroids of the files STATICALLY (probed cells are a bounded driver-side list, not a join, so the pruning shows up in PartitionFilters, needs no DPP) |
  | ``vectors`` | (neighbor_id, v) | sorted within files by neighbor_id — the exact-refine tier reads only k·refine_factor rows/query via a broadcast semi-join; parquet min/max row-group stats prune the point lookups |
  | ``cells`` | (cell, cv) | n_centroids rows — broadcast state |
  | ``codebooks`` | (j, code, cen) | m × codebook_k rows — broadcast state |
  | ``meta`` | 1 row (d, sub, m, codebook_k, n_centroids, seed, n_vectors) | geometry contract; ``query_ivfpq_index`` refuses a mismatched query dimension loudly |

- ``query_ivfpq_index(spark, path, queries, ...)`` replays the exact
  query math of ``ivfpq_topk`` (probe → per-(query, cell) residual ADC
  tables → code-only scan → exact-cosine refine) against the stored
  tables. Same seeds + same corpus ⇒ results identical to the
  in-memory operator (parity pinned in tests/test_ann_index.py); the
  PLAN differs deliberately — the ADC scan touches 8-byte code rows
  only (the float vectors never ride the probed scan), and the refine
  joins the bounded candidate set back to the vectors table.

At 100 TB: build cost is the m+1 seeded KMeans fits plus one encode
pass (once); per-query-batch cost is n_probe/n_centroids of the code
files + k·refine_factor vector rows + kilobytes of broadcast state.
The queries frame stays BOUNDED by contract (same as ``cosine_topk``:
it is broadcast, and its probed-cell list is collected driver-side —
both are |Q|-scale, the documented O(|Q|) exception class).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sales_forecast_pyspark_spark.llmdata.similarity import _ivfpq_fit


def build_ivfpq_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 8,
    codebook_k: int = 256,
    seed: int = 42,
) -> dict:
    """Fit the IVF-PQ index on ``df`` and persist it under ``path``.
    Returns the meta dict (also stored). Overwrites an existing index
    at the same path (parquet overwrite semantics, atomic per table)."""
    spark = df.sparkSession
    cells, cb, enc, d, sub = _ivfpq_fit(
        df, id_col, vec_col, n_centroids, m, codebook_k, seed
    )
    n_vectors = enc.count()
    enc.select("neighbor_id", "cell", "codes").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(os.path.join(path, "codes"))
    (
        enc.select("neighbor_id", "v")
        .sortWithinPartitions("neighbor_id")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "vectors"))
    )
    cells.write.mode("overwrite").parquet(os.path.join(path, "cells"))
    cb.write.mode("overwrite").parquet(os.path.join(path, "codebooks"))
    meta = {
        "d": d,
        "sub": sub,
        "m": m,
        "codebook_k": codebook_k,
        "n_centroids": n_centroids,
        "seed": seed,
        "n_vectors": n_vectors,
    }
    spark.createDataFrame(
        [tuple(meta.values())],
        "d int, sub int, m int, codebook_k int, n_centroids int, "
        "seed int, n_vectors long",
    ).write.mode("overwrite").parquet(os.path.join(path, "meta"))
    return meta


def append_to_ivfpq_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Encode NEW vectors with the index's EXISTING quantizers and
    append them — the incremental-ingest flow for a growing corpus
    (pairs with ``incremental_ingest_dedup``): no KMeans refit, no
    touch of already-written partitions beyond parquet append.

    Encoding is a single Arrow-batched pass (the declared-Python-
    boundary class): the cell centers and residual codebooks are
    kilobytes of broadcast state baked into the closure as numpy
    arrays, and per batch the cell assignment + per-subspace code
    argmin are two dense matrix products — the same math
    ``_ivfpq_fit``'s KMeans ``transform`` applies, so re-encoding a
    vector the index already saw yields bit-identical (cell, codes)
    (test-pinned). Returns the number of rows appended. Zero-norm
    vectors are dropped (no direction), matching the build.

    Drift honesty: appended vectors are quantized by the ORIGINAL
    codebooks. That is exactly how production IVF-PQ serves a growing
    corpus between periodic rebuilds, and exactly its known limit — if
    the data distribution drifts, residuals grow and ADC error with
    them; the in-row recall audits (``topk_recall_audit``) are the
    drift detector, and ``build_ivfpq_index`` to a fresh path is the
    rebuild."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    meta = spark.read.parquet(os.path.join(path, "meta")).first().asDict()
    d, sub, m = meta["d"], meta["sub"], meta["m"]
    cells = spark.read.parquet(os.path.join(path, "cells")).collect()
    cb = spark.read.parquet(os.path.join(path, "codebooks")).collect()
    cell_mat = np.stack(
        [np.asarray(r["cv"]) for r in sorted(cells, key=lambda r: r["cell"])]
    )
    books = []
    for j in range(m):
        rows = sorted((r for r in cb if r["j"] == j), key=lambda r: r["code"])
        books.append(np.stack([np.asarray(r["cen"]) for r in rows]))

    src = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v0"),
    )
    in_d = src.select(F.size("v0").alias("_d")).first()
    if in_d is not None and in_d["_d"] != d:
        raise ValueError(
            f"append dimension {in_d['_d']} != index dimension {d}"
        )

    out_schema = (
        f"neighbor_id {dict(src.dtypes)['neighbor_id']}, "
        "v array<double>, cell int, codes array<int>"
    )

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["v0"].to_numpy()).astype(np.float64)
            norms = np.sqrt(np.einsum("ij,ij->i", x, x))
            keep = norms > 0
            if not keep.any():
                continue
            pdf = pdf[keep]
            x = x[keep] / norms[keep, None]
            # nearest cell by squared L2: argmin(|x|^2 - 2 x.c + |c|^2)
            cd = -2.0 * (x @ cell_mat.T) + np.einsum(
                "ij,ij->i", cell_mat, cell_mat
            )
            cell = np.argmin(cd, axis=1)
            resid = x - cell_mat[cell]
            codes = np.empty((len(x), m), dtype=np.int64)
            for j in range(m):
                r = resid[:, j * sub : (j + 1) * sub]
                bd = -2.0 * (r @ books[j].T) + np.einsum(
                    "ij,ij->i", books[j], books[j]
                )
                codes[:, j] = np.argmin(bd, axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "v": list(x),
                    "cell": cell.astype("int32"),
                    "codes": list(codes),
                }
            )

    enc = src.mapInPandas(encode, out_schema)
    enc.cache()
    n_new = enc.count()
    enc.select("neighbor_id", "cell", "codes").write.mode("append").partitionBy(
        "cell"
    ).parquet(os.path.join(path, "codes"))
    (
        enc.select("neighbor_id", "v")
        .sortWithinPartitions("neighbor_id")
        .write.mode("append")
        .parquet(os.path.join(path, "vectors"))
    )
    meta["n_vectors"] = meta["n_vectors"] + n_new
    spark.createDataFrame(
        [tuple(meta.values())],
        "d int, sub int, m int, codebook_k int, n_centroids int, "
        "seed int, n_vectors long",
    ).write.mode("overwrite").parquet(os.path.join(path, "meta"))
    enc.unpersist()
    return n_new


def query_ivfpq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 6,
    refine_factor: int = 32,
) -> DataFrame:
    """Top-k over a persisted IVF-PQ index — same output contract and
    determinism as ``ivfpq_topk`` (query_id, neighbor_id, cos_sim,
    rank; seeded, neighbor-id tie order, refined scores are true
    cosines)."""
    meta = spark.read.parquet(os.path.join(path, "meta")).first().asDict()
    sub = meta["sub"]
    cells = spark.read.parquet(os.path.join(path, "cells"))
    cb = spark.read.parquet(os.path.join(path, "codebooks"))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    vectors = spark.read.parquet(os.path.join(path, "vectors"))

    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv0"),
    )
    qnorm = F.sqrt(
        F.aggregate(F.transform("qv0", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    q = (
        q0.withColumn("n", qnorm)
        .filter(F.col("n") > 0)
        .select("query_id", F.transform("qv0", lambda x: x / F.col("n")).alias("qv"))
    )
    qd = q.select(F.size("qv").alias("_d")).first()
    if qd is not None and qd["_d"] != meta["d"]:
        raise ValueError(
            f"query dimension {qd['_d']} != index dimension {meta['d']} "
            f"(index at {path} was built with d={meta['d']}, m={meta['m']})"
        )

    # Probe the n_probe nearest cells per query (identical math to
    # ivfpq_topk).
    cell_d = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.asc("cd"), F.asc("cell"))
    probes = (
        q.join(F.broadcast(cells))
        .select(
            "query_id",
            "qv",
            "cell",
            cell_d.alias("cd"),
            F.zip_with("qv", "cv", lambda x, y: x - y).alias("qr"),
        )
        .withColumn("pr", F.row_number().over(w_probe))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qv", "cell", "qr")
    )
    probes.cache()
    # bounded driver-side collect (<= |Q| x n_probe ints): an IN-list
    # of probed cells reaches the code scan as a STATIC PartitionFilter
    # — a join would need dynamic pruning, and the whole point of the
    # partitionBy(cell) layout is that unprobed cells are never read
    probed_cells = sorted(
        {r["cell"] for r in probes.select("cell").distinct().collect()}
    )

    # Per-(query, cell) ADC tables from the query residual.
    sqd = F.aggregate(
        F.zip_with(
            F.slice("qr", F.col("j") * sub + 1, sub),
            F.col("cen"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    tabs = (
        probes.join(F.broadcast(cb))
        .select("query_id", "qv", "cell", "j", "code", sqd.alias("dd"))
        .groupBy("query_id", "qv", "cell", "j")
        .agg(F.array_sort(F.collect_list(F.struct("code", "dd"))).alias("cl"))
        .select(
            "query_id", "qv", "cell", "j",
            F.transform("cl", lambda s: s["dd"]).alias("tab"),
        )
        .groupBy("query_id", "qv", "cell")
        .agg(F.array_sort(F.collect_list(F.struct("j", "tab"))).alias("jt"))
        .select(
            "query_id", "qv", "cell",
            F.transform("jt", lambda s: s["tab"]).alias("tables"),
        )
    )

    # Code-only ADC scan over the PRUNED partitions; the float vectors
    # never ride this scan (8 code bytes/row is the working set).
    adc = F.aggregate(
        F.zip_with("codes", "tables", lambda c, t: F.element_at(t, c.cast("int") + 1)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = (
        F.broadcast(tabs)
        .join(codes.filter(F.col("cell").isin(probed_cells)), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", adc.alias("adc"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    cand = scored.withColumn("prank", F.row_number().over(w_adc)).filter(
        F.col("prank") <= k * refine_factor
    )
    # Exact-cosine refine: the bounded candidate set (<= |Q| x k x
    # refine_factor rows) broadcasts against the vectors table — no
    # corpus-scale shuffle, row-group stats prune the point reads.
    cos = F.round(
        F.aggregate(
            F.zip_with("v", "qv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        ),
        6,
    )
    w_cos = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    out = (
        vectors.join(F.broadcast(cand), "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w_cos))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
    return out
