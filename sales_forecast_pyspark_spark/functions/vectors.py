"""Vector math over ``array<float/double>`` columns, JVM-side.

Built for the embeddings table (``embedding: array<float>``). Everything
here compiles to Catalyst higher-order functions (``zip_with`` +
``aggregate``) — no Python UDFs, so similarity scans stay inside
whole-stage codegen and scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: str | Column, b: str | Column) -> Column:
    """Elementwise product then sum — ``zip_with`` + ``aggregate``."""
    a, b = _as_col(a), _as_col(b)
    products = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: str | Column) -> Column:
    a = _as_col(a)
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity; null-safe on zero-norm vectors (returns null
    rather than NaN so downstream top-k ordering stays sane)."""
    a, b = _as_col(a), _as_col(b)
    denom = l2_norm(a) * l2_norm(b)
    return dot_product(a, b) / F.nullif(denom, F.lit(0.0))
