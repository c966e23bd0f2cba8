"""Text analysis over the documents table — all JVM-side expressions
(split/filter/regexp/length inside whole-stage codegen; no Python UDFs
in the hot path, per the brief's scale rules).

Components: tokenization, token/char statistics, n-gram-heuristic
language ID (stopword density), and a composite quality score built from
length, stopword and punctuation signals — the classic pre-training
corpus filters.
"""

# NOTE: no `from __future__ import annotations` here — it stringifies
# type hints module-wide, which breaks pandas_udf's signature inspection.
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Single-backslash word boundaries: the same pattern string works in
# Java regex (Spark) and RE2 (DuckDB oracles).
STOPWORD_PATTERN = r"\b(the|and|of|to|in|is|it|for|on|a)\b"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens_expr(text: str | Column) -> Column:
    """Lowercased alnum tokens: split on non-[a-z0-9] runs, drop empties."""
    return F.filter(
        F.split(F.lower(_c(text)), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


# GPT-style subword-ish segmentation for lowercase ascii: a leading-space
# word, a single digit, a punctuation run, or a whitespace char each count
# as one token. Same pattern string works in Java regex and RE2.
BPE_ISH_PATTERN = r" ?[a-z]+|[0-9]| ?[^a-z0-9\s]+|\s"


def whitespace_token_count_expr(text):
    r"""Plain whitespace token count (split on \s+ runs)."""
    t = _c(text)
    return F.size(F.filter(F.split(t, r"\s+"), lambda x: x != F.lit("")))


def bpe_token_count_expr(text):
    """BPE-ish token count: approximates subword tokenizer token counts
    (the cost metric LLM pipelines budget by) with a single JVM-side
    regex pass — ~1 token per short word / digit / punct run / space."""
    return F.regexp_count(F.lower(_c(text)), F.lit(BPE_ISH_PATTERN))


def lang_id_expr(
    text: str | Column, threshold: float = 0.03, lang: str = "en"
) -> Column:
    """N-gram-heuristic language ID: density of high-frequency English
    stopwords among tokens. Returns ``lang`` when density >= threshold,
    else 'unk'. Extendable per-language by adding pattern/threshold
    pairs; deliberately cheap (two regex passes) so it runs as a corpus
    pre-filter, not a classifier."""
    stops = F.regexp_count(F.lower(_c(text)), F.lit(STOPWORD_PATTERN))
    n_tokens = F.size(tokens_expr(text))
    return F.when(
        (stops / F.nullif(n_tokens, F.lit(0))) >= threshold, F.lit(lang)
    ).otherwise(F.lit("unk"))


def quality_exprs(text: str | Column) -> dict[str, Column]:
    """Quality-signal columns: char/token counts, mean token length,
    punctuation ratio, stopword hits, and a composite [0,1] score
    (length + stopword-density + punctuation-penalty, equally weighted).

    Every expression is integer-derived arithmetic, so results are
    bit-identical across engines and partitionings.
    """
    t = _c(text)
    low = F.lower(t)
    toks = tokens_expr(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    alpha_chars = F.length(F.regexp_replace(low, "[^a-z0-9]", ""))
    punct_chars = F.length(F.regexp_replace(low, "[a-z0-9 ]", ""))
    stop_hits = F.regexp_count(low, F.lit(STOPWORD_PATTERN))
    mean_token_len = alpha_chars / F.nullif(n_tokens, F.lit(0))
    punct_ratio = punct_chars / F.nullif(n_chars, F.lit(0))
    stop_ratio = stop_hits / F.nullif(n_tokens, F.lit(0))
    # Explicit zero for empty docs: least/greatest SKIP nulls in both
    # Spark and ANSI engines, which would silently hand an empty doc a
    # perfect stopword sub-score.
    quality = F.when(
        (n_tokens > 0) & (n_chars > 0),
        (
            F.least(n_chars / F.lit(500.0), F.lit(1.0))
            + F.least(stop_ratio * 10.0, F.lit(1.0))
            + F.greatest(F.lit(1.0) - punct_ratio * 5.0, F.lit(0.0))
        )
        / 3.0,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_chars": alpha_chars,
        "punct_chars": punct_chars,
        "stop_hits": stop_hits,
        "mean_token_len": mean_token_len,
        "punct_ratio": punct_ratio,
        "quality": quality,
    }


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One batched projection adding every quality signal + lang id —
    a single narrow stage over the scan, no shuffle."""
    exprs = quality_exprs(text_col)
    return df.select(
        "*",
        *[e.alias(n) for n, e in exprs.items()],
        lang_id_expr(text_col).alias("lang_id"),
    )


def token_count_pandas(df: DataFrame, text_col: str = "text", out_col: str = "n_tokens_pd") -> DataFrame:
    """Arrow-batched pandas UDF token counter — the vectorized-Python
    escape hatch for tokenizers that genuinely can't be expressed as JVM
    expressions (BPE and friends). Parity-tested against ``tokens_expr``;
    prefer the JVM path when regex splitting suffices."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _count(s: pd.Series) -> pd.Series:
        pat = re.compile(r"[^a-z0-9]+")
        return s.fillna("").map(lambda x: sum(1 for t in pat.split(x.lower()) if t))

    return df.withColumn(out_col, _count(F.col(text_col)))


# PII patterns — same syntax works in Java regex (Spark) and RE2
# (DuckDB), which is what makes the scrub oracle-checkable. Kept
# deliberately simple/auditable; swap in stricter patterns per policy.
PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
}


def scrub_pii_expr(text: str | Column) -> Column:
    """Redact emails, phone-like number runs, and IPv4 addresses with
    typed placeholder tokens — one chained JVM ``regexp_replace`` pass
    per pattern, no Python in the hot path. Order matters: emails are
    scrubbed before phones so the digits in a local-part are not
    half-eaten by the phone pattern."""
    out = _c(text)
    for pat, token in (PII_PATTERNS[k] for k in ("email", "phone", "ipv4")):
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts_exprs(text: str | Column) -> dict[str, Column]:
    """Per-kind PII hit counts (audit/reporting tier of the scrubber)."""
    t = _c(text)
    return {
        f"n_{kind}": F.regexp_count(t, F.lit(pat))
        for kind, (pat, _) in PII_PATTERNS.items()
    }


def chunk_exprs(
    text: str | Column, chunk_tokens: int = 100, overlap: int = 20
) -> Column:
    """Sliding-window document chunks as an array of structs
    ``(chunk_id, chunk_text, n_chunk_tokens)`` — the splitting step that
    turns long documents into training/embedding-sized pieces.

    Windows start every ``chunk_tokens - overlap`` tokens, so adjacent
    chunks share ``overlap`` tokens of context; the final chunk may be
    shorter (no padding, no dropped tail). Zero-token docs yield an
    empty array (explode drops them). All JVM-side higher-order
    functions over one tokenization — chunking 100 TB of text is a
    map-only stage with NO shuffle.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens_expr(text)
    n = F.size(toks)
    starts = F.when(n <= 0, F.array()).otherwise(
        F.sequence(F.lit(0), n - 1, F.lit(step))
    )
    return F.transform(
        starts,
        lambda start, i: F.struct(
            i.alias("chunk_id"),
            F.array_join(F.slice(toks, start + 1, chunk_tokens), " ").alias(
                "chunk_text"
            ),
            F.least(F.lit(chunk_tokens), n - start).alias("n_chunk_tokens"),
        ),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 100,
    overlap: int = 20,
) -> DataFrame:
    """Explode each document into its sliding-window chunks:
    ``(id, chunk_id, n_chunk_tokens, chunk_text)`` rows."""
    ch = F.explode(chunk_exprs(text_col, chunk_tokens, overlap)).alias("c")
    return df.select(F.col(id_col), ch).select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def ngrams_expr(text: str | Column, n: int) -> Column:
    """ALL word n-grams (with repeats — unlike ``shingles_expr``'s
    distinct set): the repetition-measurement primitive. Documents with
    fewer than ``n`` tokens yield an empty array."""
    toks = tokens_expr(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Per-document repetition profile — the duplicate-n-gram family of
    pretraining quality filters (a template-generated or looping doc
    shows a high repeated-n-gram fraction and a dominant top n-gram;
    thresholding these is the classic Gopher-rule cut).

    For each n in ``ns``, three INTEGER columns: ``n{n}_total`` (all
    n-grams), ``n{n}_distinct``, and ``n{n}_top`` (occurrences of the
    most frequent n-gram). Integers by design: the interesting ratios
    (1 − distinct/total, top/total) have document-dependent
    denominators, so emitting the exact counts keeps the result
    bit-exact across engines and lets callers pick thresholds
    downstream.

    Shape: ONE tagged explode + TWO codegen'd hash aggregations, zero
    joins. Each doc's n-gram arrays for every n are concatenated into
    (n, gram) structs and exploded ONCE (explode_outer, so gram-less
    docs survive as a NULL row instead of needing a join back to the
    doc spine); groupBy(doc, n, gram) counts occurrences, then one
    per-doc aggregation derives all three columns per n as
    conditional aggregates (total = sum of counts, distinct = count
    of gram groups, top = max count). History: the first shape paid
    two explodes, four aggregations, and two joins-back per run —
    and the join sides sat behind the explode where static size
    estimates are fiction (the r09 static-broadcast class); a
    map-only rewrite (top count == longest equal-run in the per-row
    SORTED array via an F.aggregate fold) measured SLOWER (18.5s vs
    14.5s at sf0.1 — higher-order folds evaluate interpreted,
    outside whole-stage codegen, and re-sort per row), so the
    explode stays and the fan-in moved into the aggregation layer
    instead: measured ~9s at sf0.1 (from 14.5s), linear and
    shuffle-minimal at any scale.
    """
    def _tag(nv: int):
        # NOT `lambda x, n=n: ...`: F.transform dispatches on lambda
        # arity, so a second parameter (even defaulted) receives the
        # ELEMENT INDEX and silently shadows the closure
        return lambda x: F.struct(F.lit(nv).alias("n"), x.alias("gram"))

    base = df.select(
        F.col(id_col),
        F.explode_outer(
            F.concat(
                *[F.transform(ngrams_expr(text_col, n), _tag(n)) for n in ns]
            )
        ).alias("_t"),
    ).select(id_col, F.col("_t.n").alias("_n"), F.col("_t.gram").alias("_gram"))
    per_gram = base.groupBy(id_col, "_n", "_gram").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    cols = []
    for n in ns:
        hit = F.col("_n") == n
        cols.extend(
            [
                F.coalesce(F.sum(F.when(hit, F.col("_cnt"))), F.lit(0))
                .cast("int")
                .alias(f"n{n}_total"),
                F.count(F.when(hit, F.lit(1))).cast("int").alias(f"n{n}_distinct"),
                F.coalesce(F.max(F.when(hit, F.col("_cnt"))), F.lit(0))
                .cast("int")
                .alias(f"n{n}_top"),
            ]
        )
    return per_gram.groupBy(id_col).agg(*cols)


def unigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 7,
) -> DataFrame:
    """Corpus-internal language-model quality score: mean unigram
    surprisal −mean(ln p(w)) per document, with p(w) the token's
    corpus frequency — the zero-dependency stand-in for the
    perplexity filters real pipelines run with external LMs. Low
    scores flag repetitive/templated text (tokens the corpus has
    everywhere); high scores flag gibberish (tokens the corpus has
    nowhere). Two corpus aggregates (token frequencies + total), a
    frequency join, one doc-keyed mean — all hash-partitioned.

    Determinism follows the stable_avg pattern: per-token surprisal is
    rounded at ``scale`` then summed in DECIMAL, so the mean is exact
    given the rounded values, and ln() outputs (identical IEEE doubles
    across engines except at most the last ulp) can only diverge after
    rounding if a value lands within an ulp of a .5e-7 boundary —
    measure-zero for transcendentals. Output rounded to 4.
    """
    from sales_forecast_pyspark_spark.functions.deterministic import dec_sum

    tok = df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    surp = (
        # shuffle_hash hint: token frequency is vocabulary-scale
        # (Heaps-law unbounded with the corpus) behind the token
        # explode — the static broadcast estimate under it is fiction
        # (audit r09) — but it is an AGGREGATE of `tok` (one tiny row
        # per term), so hash-building it per partition avoids sorting
        # the corpus-token-scale side; `total` stays broadcast: a
        # global agg is 1 row by construction
        tok.join(freq.hint("shuffle_hash"), "t")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.round(
                F.log(F.col("total").cast("double"))
                - F.log(F.col("cnt").cast("double")),
                scale,
            ).alias("s"),
        )
    )
    return (
        surp.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                dec_sum(F.col("s"), scale=scale) / F.count(F.lit(1)), 4
            ).alias("avg_surprisal"),
        )
        .orderBy(id_col)
    )


def bigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 7,
) -> DataFrame:
    """Second-order LM quality score: mean bigram surprisal
    −mean(ln p(w2|w1)) per document with add-one smoothing,
    p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V). The bigram lens catches
    what ``unigram_surprisal`` can't: shuffled-but-common-token text
    (word salad from frequent words) scores HIGH here and low there,
    so the pair separates gibberish from merely-common vocabulary.

    Bigrams are built in-row (one ``transform`` over the token array,
    no self-join on position), then counted with the same two corpus
    aggregates + join shape as the unigram tier. c(w1) is the corpus
    UNIGRAM count (the standard estimator); V = distinct unigrams
    (1-row broadcast). Determinism: identical to unigram_surprisal —
    surprisals rounded at ``scale``, decimal mean, round 4."""
    from sales_forecast_pyspark_spark.functions.deterministic import dec_sum

    toks = df.select(
        F.col(id_col), tokens_expr(text_col).alias("_toks")
    )
    bg = (
        toks.filter(F.size("_toks") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_toks) - 2), i -> "
                    "struct(_toks[i] AS w1, concat(_toks[i], ' ', _toks[i+1]) AS b))"
                )
            ).alias("p"),
        )
        .select(id_col, "p.w1", "p.b")
    )
    uni = (
        toks.select(F.explode("_toks").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("vsize"))
    c2 = bg.groupBy("b").agg(F.count(F.lit(1)).alias("c2"))
    surp = (
        # shuffle_hash hints: unigram and bigram count frames are
        # vocabulary-scale behind the token explode — static broadcast
        # estimates are fiction (audit r09) — and both are aggregates
        # (one row per (bi)gram), so per-partition hash builds beat
        # sorting the token-scale side; `vocab` is a 1-row global agg
        bg.join(uni.withColumnRenamed("t", "w1").hint("shuffle_hash"), "w1")
        .join(c2.hint("shuffle_hash"), "b")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.round(
                F.log(
                    (F.col("c1") + F.col("vsize")).cast("double")
                    / (F.col("c2") + F.lit(1)).cast("double")
                ),
                scale,
            ).alias("s"),
        )
    )
    return (
        surp.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                dec_sum(F.col("s"), scale=scale) / F.count(F.lit(1)), 4
            ).alias("avg_surprisal"),
        )
        .orderBy(id_col)
    )
