"""Blocked fuzzy (edit-distance) join.

The reference resolves names EXACT-only (``strict=True`` passed to
``species.name_backbone``, /root/reference/gbif_helper.py:18, so GBIF
never fuzzy-matches — SURVEY.md §2-A). Real taxon lists carry typos;
this operator is the opt-in fuzzy extension: a candidate join gated by
cheap blocking predicates, then the exact Levenshtein filter.

Scale design: a naive edit-distance join is a cross join (O(n·m)
Levenshtein calls — dead at any scale). Blocking makes it an
EQUI-join: candidates must share the lowercased first character and
have lengths within ``max_distance`` (both NECESSARY conditions for
edit distance ≤ d only in the length case; the first-character block
is a deliberate recall trade documented in the signature — typos in
the first letter are rare). The length band uses the same
explode-one-side trick as range_join: the left row keeps its single
(char, len) key while the right side is replicated across its
2·d + 1 qualifying lengths, so every candidate pair meets exactly
once and the expensive Levenshtein runs only inside blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    how: str = "inner",
) -> DataFrame:
    """Pairs with ``levenshtein(lower(left_col), lower(right_col)) <=
    max_distance`` among candidates sharing the first character and a
    length within ``max_distance``. Adds a ``levenshtein`` column.

    Blocking is part of the semantics: a match whose first characters
    differ is NOT returned (documented recall trade; run with a second
    blocking key — e.g. soundex — unioned in, if first-letter typos
    matter).
    """
    if how != "inner":
        raise ValueError("fuzzy_join supports inner joins only")
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"overlapping column names: {sorted(clash)}")
    d = max_distance
    lb = left.withColumns(
        {
            "_c1": F.substring(F.lower(F.col(left_col)), 1, 1),
            "_len": F.length(left_col),
        }
    )
    rb = right.withColumns(
        {
            "_c1": F.substring(F.lower(F.col(right_col)), 1, 1),
            "_rlen": F.length(right_col),
        }
    ).withColumn(
        "_len", F.explode(F.sequence(F.col("_rlen") - d, F.col("_rlen") + d))
    )
    dist = F.levenshtein(F.lower(F.col(left_col)), F.lower(F.col(right_col)))
    return (
        lb.join(rb, ["_c1", "_len"], "inner")
        .withColumn("levenshtein", dist)
        .filter(F.col("levenshtein") <= d)
        .drop("_c1", "_len", "_rlen")
    )


def fuzzy_resolve_candidates(
    names: DataFrame,
    taxonomy: DataFrame,
    name_col: str = "_name",
    max_distance: int = 2,
) -> DataFrame:
    """Fuzzy candidates for names that failed exact resolution:
    (input name, canonical_name, key, levenshtein), nearest-first per
    name. A UNIQUE minimum-distance candidate is the safe auto-accept;
    ties should stay unresolved (mirrors the EXACT-or-nothing
    ambiguity rule of operators/resolution.py applied at distance d).
    """
    dim = taxonomy.select(
        F.col("canonical_name").alias("_cand_name"),
        F.when(F.col("is_synonym"), F.col("accepted_key"))
        .otherwise(F.col("key"))
        .alias("_cand_key"),
    )
    return fuzzy_join(
        names, dim, name_col, "_cand_name", max_distance=max_distance
    )
