"""Scalar/column function library (SURVEY.md §2 ops 29-34 plus the
beyond-reference text/vector functions for training-data pipelines)."""

from gbif_filter_python_spark.functions.taxid import (
    parse_taxid,
    is_valid_taxid,
    format_taxid,
)
from gbif_filter_python_spark.functions.text import (
    token_count,
    quality_score,
    language_guess,
    fingerprint64,
    normalized_text,
)
from gbif_filter_python_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "parse_taxid",
    "is_valid_taxid",
    "format_taxid",
    "token_count",
    "quality_score",
    "language_guess",
    "fingerprint64",
    "normalized_text",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
