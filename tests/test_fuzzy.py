"""Blocked fuzzy-join tests (operators/fuzzy.py): edit-distance
matching, the blocking semantics (first char + length band), and the
taxonomy fuzzy-candidate helper."""

from __future__ import annotations

import pytest

from gbif_filter_python_spark.operators.fuzzy import (
    fuzzy_join,
    fuzzy_resolve_candidates,
)


@pytest.fixture(scope="module")
def names(spark):
    return spark.createDataFrame(
        [("Lumbricus",), ("Eisenia",), ("Ambigua",)], "name string"
    )


class TestFuzzyJoin:
    def test_matches_within_distance(self, spark, names):
        probes = spark.createDataFrame(
            [("Lumbricas",),   # 1 substitution
             ("Lmbricus",),    # 1 deletion
             ("Eisenia",),     # exact (distance 0)
             ("Xumbricus",)],  # distance 1 but FIRST CHAR differs → blocked
            "probe string",
        )
        got = {
            (r["probe"], r["name"]): r["levenshtein"]
            for r in fuzzy_join(probes, names, "probe", "name").collect()
        }
        assert got == {
            ("Lumbricas", "Lumbricus"): 1,
            ("Lmbricus", "Lumbricus"): 1,
            ("Eisenia", "Eisenia"): 0,
        }

    def test_length_band_blocks_long_edits(self, spark, names):
        probes = spark.createDataFrame(
            [("Lum",)], "probe string"
        )  # same first char but length differs by 6 > max_distance
        assert fuzzy_join(probes, names, "probe", "name").count() == 0

    def test_case_insensitive(self, spark, names):
        probes = spark.createDataFrame([("lumbricus",)], "probe string")
        rows = fuzzy_join(probes, names, "probe", "name").collect()
        assert len(rows) == 1 and rows[0]["levenshtein"] == 0

    def test_rejects_overlap_and_outer(self, spark, names):
        clash = spark.createDataFrame([("x",)], "name string")
        with pytest.raises(ValueError, match="overlapping"):
            fuzzy_join(clash, names, "name", "name")
        probes = spark.createDataFrame([("x",)], "probe string")
        with pytest.raises(ValueError, match="inner"):
            fuzzy_join(probes, names, "probe", "name", how="left")


class TestFuzzyResolveCandidates:
    def test_synonym_redirects_and_distance_order(self, spark, taxonomy):
        names = spark.createDataFrame(
            [("Lumbricus terrestrus",)], "_name string"  # typo: -us
        )
        rows = fuzzy_resolve_candidates(names, taxonomy, max_distance=2).collect()
        got = {(r["_cand_name"], r["_cand_key"]): r["levenshtein"] for r in rows}
        # the typo'd species resolves to the accepted key at distance 1
        assert got[("Lumbricus terrestris", 4000)] == 1
        # the SYNONYM row "Lumbricus oldname" is > distance 2 → absent;
        # no candidate maps to a raw synonym key
        assert all(key != 4003 for (_, key) in got)
