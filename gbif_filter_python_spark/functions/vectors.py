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


def hashed_embedding(text: Column, dim: int = 64) -> Column:
    """Feature-hashing text embedding: normalized words hash into
    ``dim`` buckets (md5-based — reproducible across engines and
    releases, like corpus.split_bucket), counts L2-normalize into a
    unit ``array<double>`` — a model-free featurizer that makes every
    ANN/dedup operator in similarity.py/dedup.py applicable to raw
    text columns.

    Pure Column ops end to end (no UDF): one O(dim) fold per word.
    Values round to 6dp so downstream hashes are fp-stable
    cross-engine; empty/whitespace text yields the zero vector.
    """
    norm_text = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "),
            "\\s+",
            " ",
        )
    )
    words = F.when(norm_text == "", F.array().cast("array<string>")).otherwise(
        F.split(norm_text, " ")
    )
    bucket = lambda w: (  # noqa: E731
        F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long") % dim
    ).cast("int")
    buckets = F.transform(words, bucket)
    counts = F.aggregate(
        buckets,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, b: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda v, i: v + F.when(b == i, 1.0).otherwise(0.0),
        ),
    )
    norm = F.sqrt(
        F.aggregate(counts, F.lit(0.0), lambda a, v: a + v * v)
    )
    return F.transform(
        counts,
        lambda v: F.when(norm > 0, F.round(v / norm, 6)).otherwise(0.0),
    )
