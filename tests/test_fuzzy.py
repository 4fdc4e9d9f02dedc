"""Blocked fuzzy-join tests (operators/fuzzy.py): edit-distance
matching, the blocking semantics (first char + length band), and the
taxonomy fuzzy-candidate helper."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


class TestLongestPrefixMatch:
    def _rules(self, spark):
        return spark.createDataFrame(
            [
                ("/a/", "ra", 1),
                ("/a/b/", "rab", 2),
                ("/a/bc", "rabc", 3),
                ("/z/", "rz", 4),
            ],
            "prefix string, rule_id string, quota int",
        )

    def _facts(self, spark):
        return spark.createDataFrame(
            [
                (1, "/a/b/file"),    # /a/b/ (5) beats /a/ (3)
                (2, "/a/bcd"),       # /a/bc (5) beats /a/
                (3, "/a/x"),         # only /a/
                (4, "/q/unmatched"), # NULL rule
                (5, "/z/"),          # exact boundary: /z/ matches
            ],
            "id int, path string",
        )

    def test_map_and_join_paths_agree(self, spark):
        from gbif_filter_python_spark.operators.resolution import (
            longest_prefix_match,
        )

        expect = {
            1: ("rab", 2),
            2: ("rabc", 3),
            3: ("ra", 1),
            4: (None, None),
            5: ("rz", 4),
        }
        for method in ("map", "join"):
            out = {
                r["id"]: (r["rule_id"], r["quota"])
                for r in longest_prefix_match(
                    self._facts(spark),
                    self._rules(spark),
                    "path",
                    method=method,
                ).collect()
            }
            assert out == expect, method

    def test_duplicate_prefix_rejected(self, spark):
        import pytest as _p

        from gbif_filter_python_spark.operators.resolution import (
            longest_prefix_match,
        )

        dup = spark.createDataFrame(
            [("/a/", "x"), ("/a/", "y")], "prefix string, rule_id string"
        )
        with _p.raises(ValueError, match="duplicate"):
            longest_prefix_match(self._facts(spark), dup, "path")

    def test_map_guard_and_bad_method(self, spark):
        import pytest as _p

        from gbif_filter_python_spark.operators.resolution import (
            longest_prefix_match,
        )

        with _p.raises(ValueError, match="max_map_rules"):
            longest_prefix_match(
                self._facts(spark),
                self._rules(spark),
                "path",
                max_map_rules=2,
            )
        with _p.raises(ValueError, match="method"):
            longest_prefix_match(
                self._facts(spark), self._rules(spark), "path", method="x"
            )

    def test_map_path_plan_has_no_shuffle(self, spark):
        from gbif_filter_python_spark.operators.resolution import (
            longest_prefix_match,
        )
        from gbif_filter_python_spark.plans.inspect import explain_str

        out = longest_prefix_match(
            self._facts(spark), self._rules(spark), "path", method="map"
        )
        plan = explain_str(out, "simple")
        assert "Exchange" not in plan, plan


class TestErMatchScores:
    """Fellegi-Sunter weighted record-linkage scoring."""

    COMPS = [
        {"col": "name", "kind": "edit", "param": 1,
         "w_agree": 4.0, "w_disagree": -2.0},
        {"col": "city", "kind": "exact",
         "w_agree": 1.5, "w_disagree": -1.5},
        {"col": "bal", "kind": "abs_tol", "param": 0.01,
         "w_agree": 2.0, "w_disagree": -1.0},
    ]

    def _recs(self, spark):
        rows = [
            (1, "smith", "oslo", 10.0),
            (2, "smithx", "oslo", 10.005),   # dup of 1: all agree
            (3, "smithx", "bergen", 99.0),   # name agrees only
            (4, None, "oslo", 10.0),         # null name
        ]
        return spark.createDataFrame(
            rows, "id long, name string, city string, bal double"
        )

    def _score(self, spark, pairs):
        from gbif_filter_python_spark.operators.fuzzy import (
            er_match_scores,
        )

        p = spark.createDataFrame(pairs, "id_a long, id_b long")
        return {
            (r.id_a, r.id_b): r
            for r in er_match_scores(
                self._recs(spark), p, self.COMPS, id_col="id",
                match_threshold=6.0, possible_threshold=0.0,
            ).collect()
        }

    def test_planted_duplicate_scores_match(self, spark):
        out = self._score(spark, [(1, 2), (1, 3), (2, 3)])
        assert out[(1, 2)].score == 7.5
        assert out[(1, 2)].decision == "match"
        # (1,3): name edit 1 agrees (+4), city disagrees (-1.5),
        # balance |10-99| fails (-1) -> 1.5 possible
        assert out[(1, 3)].score == 1.5
        assert out[(1, 3)].decision == "possible"
        # (2,3): name exact (+4), city (-1.5), bal (-1) -> 1.5
        assert out[(2, 3)].score == 1.5

    def test_null_field_contributes_zero_and_null_flag(self, spark):
        out = self._score(spark, [(1, 4)])
        r = out[(1, 4)]
        assert r.name_edit_agree is None
        # city agrees (+1.5), bal agrees (+2.0), name contributes 0
        assert r.score == 3.5
        assert r.decision == "possible"

    def test_nonmatch_below_possible_threshold(self, spark):
        recs = self._recs(spark)
        from gbif_filter_python_spark.operators.fuzzy import (
            er_match_scores,
        )

        p = spark.createDataFrame([(3, 4)], "id_a long, id_b long")
        r = er_match_scores(
            recs, p, self.COMPS, id_col="id"
        ).collect()[0]
        # name null -> 0; city disagree -1.5; bal disagree -1 -> -2.5
        assert r.score == -2.5 and r.decision == "nonmatch"

    def test_bad_kind_rejected(self, spark):
        import pytest as _p

        from gbif_filter_python_spark.operators.fuzzy import (
            er_match_scores,
        )

        with _p.raises(ValueError, match="comparator kind"):
            er_match_scores(
                self._recs(spark),
                spark.createDataFrame([(1, 2)], "id_a long, id_b long"),
                [{"col": "name", "kind": "soundex"}],
                id_col="id",
            )


class TestJaroWinkler:
    def test_known_values(self):
        from gbif_filter_python_spark.operators.fuzzy import (
            jaro_winkler_py as jw,
        )

        assert abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12
        assert abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12
        assert abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12
        assert abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-12
        assert jw("ab", "ba") == 0.0  # window 0: no matches
        assert jw("same", "same") == 1.0
        assert jw("", "x") == 0.0 and jw("", "") == 0.0
        assert jw(None, "x") is None and jw("x", None) is None
        # strcmp95 conventions witnessed against DuckDB's native impl:
        # boost threshold — jaro 2/3 <= 0.7, so the 4-char common
        # prefix earns NO bonus
        assert abs(jw("red bolt", "red gear") - 2 / 3) < 1e-12
        # integer-halved transpositions: 3 differing matched positions
        # count as t=1, not 1.5
        assert abs(jw("large rod", "red gizmo") - 0.6370370370370371) < 1e-12

    def test_prefix_bonus_capped_at_four(self):
        from gbif_filter_python_spark.operators.fuzzy import (
            jaro_winkler_py as jw,
        )

        # identical 6-char prefix: bonus must use l=4, not 6
        a, b = "abcdefgh", "abcdefxy"
        la = lb = 8
        # independent jaro computation: 6 matches, 0 transpositions
        jaro = (6 / la + 6 / lb + 1.0) / 3
        assert abs(jw(a, b) - (jaro + 4 * 0.1 * (1 - jaro))) < 1e-12

    def test_column_udf_matches_python(self, spark):
        from gbif_filter_python_spark.operators.fuzzy import (
            jaro_winkler,
            jaro_winkler_py,
        )

        rows = [("martha", "marhta"), ("CRATE", "TRACE"),
                ("abc", None), ("", "zz")]
        df = spark.createDataFrame(rows, "a string, b string")
        got = df.select("a", "b", jaro_winkler(
            F.col("a"), F.col("b")).alias("jw")).collect()
        for r in got:
            assert r["jw"] == jaro_winkler_py(r["a"], r["b"])


@pytest.mark.parametrize("seed", [0])
def test_jaro_winkler_convention_pinned_to_duckdb(seed):
    """Property fuzz: jaro_winkler_py must match DuckDB's native
    jaro_winkler_similarity bit-for-bit on arbitrary strings — the
    independent-second-implementation contract behind the
    jaro_winkler_pairs oracle. Any drift in the greedy matching,
    integer-halved transpositions, or 0.7 boost threshold fails here
    before it can hash-fail the driver."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gbif_filter_python_spark.operators.fuzzy import jaro_winkler_py

    con = duckdb.connect()
    alpha = st.text(
        alphabet="abcdefgh -", min_size=0, max_size=20
    )

    @settings(max_examples=300, deadline=None)
    @given(a=alpha, b=alpha)
    def _check(a, b):
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        got = jaro_winkler_py(a, b)
        assert got == want, (a, b, got, want)

    _check()


class TestPairEval:
    def test_hand_counts_and_canonicalization(self, spark):
        from gbif_filter_python_spark.operators.fuzzy import pair_eval

        pred = spark.createDataFrame(
            # (2,1) duplicates (1,2) reversed; (3,3) is a self-pair
            [(1, 2), (2, 1), (3, 3), (4, 5), (6, 7)],
            "id_a long, id_b long",
        )
        truth = spark.createDataFrame(
            [(1, 2), (4, 5), (8, 9)], "id_a long, id_b long"
        )
        (r,) = pair_eval(pred, truth).collect()
        assert (r["n_pred"], r["n_true"]) == (3, 3)  # canon: {12,45,67}
        assert (r["tp"], r["fp"], r["fn"]) == (2, 1, 1)
        assert abs(r["precision"] - 2 / 3) < 1e-6
        assert abs(r["recall"] - 2 / 3) < 1e-6
        assert abs(r["f1"] - 2 / 3) < 1e-6

    def test_zero_tp_f1_is_zero(self, spark):
        from gbif_filter_python_spark.operators.fuzzy import pair_eval

        pred = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        truth = spark.createDataFrame([(3, 4)], "id_a long, id_b long")
        (r,) = pair_eval(pred, truth).collect()
        assert r["tp"] == 0 and r["f1"] == 0.0


    def test_empty_prediction_set_yields_null_precision(self, spark):
        from gbif_filter_python_spark.operators.fuzzy import pair_eval

        pred = spark.createDataFrame([(3, 3)], "id_a long, id_b long")
        truth = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        (r,) = pair_eval(pred, truth).collect()  # pred canonicalizes empty
        assert r["n_pred"] == 0
        assert r["precision"] is None and r["f1"] is None
        assert r["recall"] == 0.0
