"""Vector column functions over ``array<float>`` embeddings.

Built on ``F.zip_with`` / ``F.aggregate`` higher-order functions —
JVM-side, no Python per row — for the similarity-search operators
(SURVEY.md beyond-reference block). DuckDB twins:
``list_dot_product`` / ``list_cosine_similarity``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))


def max_abs(a: Column) -> Column:
    """Largest |v| of the vector (exact — no summation order issues)."""
    return F.aggregate(
        a,
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))),
    )


def quantize_int8(a: Column) -> Column:
    """Symmetric int8 quantization: ``round(v * 127 / max|v|)``.

    The standard embedding-compression step before writing an ANN
    index (4x smaller than float32). Uses ``floor(x + 0.5)`` instead
    of ``round`` so ties resolve identically across engines, and
    every arithmetic op is a single IEEE double operation (max, mul,
    div) — bit-deterministic, so the DuckDB oracle hash-matches.
    Zero vectors quantize to all zeros.
    """
    m = max_abs(a)
    return F.transform(
        a,
        lambda v: F.when(m > 0, F.floor(v.cast("double") * 127.0 / m + 0.5))
        .otherwise(F.lit(0))
        .cast("int"),
    )
