"""Round-11 operators: domain_overlap_matrix (pairwise source
contamination) and dup_rate_by_source (per-source duplication
rollup). Hand-computed cases, densify semantics, and degenerate
shapes."""

from __future__ import annotations

import pytest

from gbif_filter_python_spark.operators.corpus import (
    domain_overlap_matrix,
)
from gbif_filter_python_spark.operators.dedup import dup_rate_by_source


# ---------------------------------------------------------------------------
# domain_overlap_matrix
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_overlap_matrix_hand_computed(spark):
    # srcA: trigrams {a b c, b c d} ; srcB: {b c d, c d e} -> share 1
    rows = [
        (1, "a b c d", "srcA"),
        (2, "b c d e", "srcB"),
    ]
    out = domain_overlap_matrix(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["dom_a"], r["dom_b"]) == ("srcA", "srcB")
    assert (r["grams_a"], r["grams_b"], r["shared_grams"]) == (2, 2, 1)
    assert r["jaccard"] == pytest.approx(1 / 3, abs=1e-6)
    assert r["containment"] == pytest.approx(0.5, abs=1e-6)


def test_overlap_matrix_densifies_zero_overlap_pairs(spark):
    rows = [
        (1, "aa bb cc", "s1"),
        (2, "dd ee ff", "s2"),
        (3, "aa bb cc", "s3"),
    ]
    out = {
        (r["dom_a"], r["dom_b"]): r
        for r in domain_overlap_matrix(_docs(spark, rows)).collect()
    }
    # all 3 pairs present even though (s1,s2) and (s2,s3) share nothing
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert out[("s1", "s2")]["shared_grams"] == 0
    assert out[("s1", "s2")]["jaccard"] == 0.0
    assert out[("s1", "s3")]["shared_grams"] == 1
    assert out[("s1", "s3")]["jaccard"] == 1.0
    assert out[("s1", "s3")]["containment"] == 1.0


def test_overlap_matrix_distinct_grams_within_domain(spark):
    # repeated trigram inside one domain counts ONCE (distinct grams)
    rows = [
        (1, "x y z", "s1"),
        (2, "x y z", "s1"),
        (3, "x y z", "s2"),
    ]
    r = domain_overlap_matrix(_docs(spark, rows)).collect()[0]
    assert (r["grams_a"], r["grams_b"], r["shared_grams"]) == (1, 1, 1)


def test_overlap_matrix_short_and_null_docs_drop_out(spark):
    # < n words yields no grams; NULL source rows are excluded
    rows = [
        (1, "one two", "s1"),  # too short for trigrams
        (2, "p q r s", "s1"),
        (3, "p q r", None),  # null domain ignored
        (4, "p q r", "s2"),
    ]
    out = domain_overlap_matrix(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["dom_a"], r["dom_b"]) == ("s1", "s2")
    assert (r["grams_a"], r["grams_b"], r["shared_grams"]) == (2, 1, 1)


# ---------------------------------------------------------------------------
# dup_rate_by_source
# ---------------------------------------------------------------------------


def test_dup_rate_by_source_hand_computed(spark):
    rows = [
        (1, "alpha beta", "s1"),  # dup group A (cross-source)
        (2, "Alpha  BETA!", "s2"),  # same normalized text as 1
        (3, "gamma delta", "s1"),  # dup group B (within s1)
        (4, "gamma delta", "s1"),
        (5, "unique text", "s1"),
    ]
    out = {
        r["source"]: r
        for r in dup_rate_by_source(_docs(spark, rows)).collect()
    }
    s1 = out["s1"]
    # s1: 4 docs, 3 distinct texts (alpha-beta, gamma-delta, unique)
    assert (s1["n_docs"], s1["n_distinct"]) == (4, 3)
    # dup docs: doc1 (group of 2 cross-source) + docs 3,4 = 3
    assert s1["n_dup_docs"] == 3
    assert s1["n_cross_source_dups"] == 1
    assert s1["dup_rate"] == pytest.approx(0.75, abs=1e-6)
    assert s1["excess_rate"] == pytest.approx(0.25, abs=1e-6)
    s2 = out["s2"]
    assert (s2["n_docs"], s2["n_distinct"]) == (1, 1)
    assert s2["n_dup_docs"] == 1
    assert s2["n_cross_source_dups"] == 1
    assert s2["excess_rate"] == 0.0


def test_dup_rate_no_dups_is_all_zero(spark):
    rows = [(1, "aa", "s1"), (2, "bb", "s1")]
    r = dup_rate_by_source(_docs(spark, rows)).collect()[0]
    assert (r["n_dup_docs"], r["n_cross_source_dups"]) == (0, 0)
    assert r["dup_rate"] == 0.0 and r["excess_rate"] == 0.0
