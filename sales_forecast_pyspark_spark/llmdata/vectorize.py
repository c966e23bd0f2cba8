"""TF-IDF text vectorization (SURVEY.md §7 step 9) and its cosine
similarity hook.

Pipeline shape, 100 TB-first:
- tokenization is the JVM ``tokens_expr`` (codegen, no Python);
- ``HashingTF`` is a stateless narrow map (murmur3 term hashing — no
  vocabulary broadcast, no fit job, deterministic across runs/engines);
- ``IDF.fit`` is the ONLY corpus pass: one treeAggregate computing
  document frequencies; the transform is again narrow;
- vectors stay SPARSE end-to-end — the similarity hook feeds MLlib
  vectors straight into the BRP-LSH equality-join path
  (``lsh_similarity_join(vector_input=True)``), never densifying
  through a 2^b-wide array column.

The hashing variant is chosen over CountVectorizer+IDF deliberately:
CountVectorizer's fit collects a vocabulary to the driver and broadcasts
it — fine at 1M terms, a scale hazard at web-corpus cardinality.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sales_forecast_pyspark_spark.llmdata.text import tokens_expr


def tfidf_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 4096,
    min_doc_freq: int = 1,
    out_col: str = "tfidf",
) -> DataFrame:
    """(id, n_tokens, tfidf) with ``out_col`` a sparse MLlib vector.

    ``num_features`` is the hash-bucket count (power of two keeps the
    murmur3 modulo well-distributed); ``min_doc_freq`` zeroes terms
    rarer than the floor, the classic noise cut. Zero-token documents
    come out as all-zero vectors — callers doing similarity should
    filter on ``n_tokens > 0`` (a zero vector has no direction).
    """
    from pyspark.ml.feature import IDF, HashingTF

    toks = df.select(
        F.col(id_col), tokens_expr(text_col).alias("tokens")
    ).withColumn("n_tokens", F.size("tokens"))
    tf = HashingTF(
        inputCol="tokens", outputCol="_tf", numFeatures=num_features
    ).transform(toks)
    idf_model = IDF(inputCol="_tf", outputCol=out_col, minDocFreq=min_doc_freq).fit(tf)
    return idf_model.transform(tf).select(id_col, "n_tokens", out_col)


def tfidf_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 4096,
    cos_threshold: float = 0.6,
    num_hash_tables: int = 3,
    bucket_length: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Document pairs with TF-IDF cosine similarity >= ``cos_threshold``,
    without an all-pairs join: L2-normalize the sparse vectors, then run
    the seeded BRP-LSH equality-join path with the Euclidean threshold
    ``sqrt(2 * (1 - cos))`` — on unit vectors ``d² = 2(1 − cos)``, so the
    Euclidean ball IS the cosine cap. Returns (id_a, id_b, cos_sim),
    id_a < id_b, deterministically ordered."""
    from pyspark.ml.feature import Normalizer

    from sales_forecast_pyspark_spark.llmdata.similarity import lsh_similarity_join

    vecs = tfidf_vectors(
        df, text_col=text_col, id_col=id_col, num_features=num_features
    ).filter(F.col("n_tokens") > 0)
    unit = Normalizer(inputCol="tfidf", outputCol="unit", p=2.0).transform(vecs)
    dist_threshold = math.sqrt(2.0 * (1.0 - cos_threshold))
    pairs = lsh_similarity_join(
        unit,
        id_col=id_col,
        vec_col="unit",
        bucket_length=bucket_length,
        num_hash_tables=num_hash_tables,
        distance_threshold=dist_threshold,
        seed=seed,
        vector_input=True,
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(F.lit(1.0) - (F.col("dist") * F.col("dist")) / 2.0, 6).alias("cos_sim"),
    ).orderBy("id_a", "id_b")
