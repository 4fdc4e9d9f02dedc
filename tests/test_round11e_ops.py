"""Round-11 fifth batch: contingency-table association family —
cramers_v (symmetric effect size), theil_u (asymmetric uncertainty),
gamma_assoc (ordinal concordance), bowker_test (k×k symmetry).
Hand-computed tables + pure-Python pair replays."""

from __future__ import annotations

import itertools
import math

import pytest

from gbif_filter_python_spark.operators.analytics import bowker_test
from gbif_filter_python_spark.operators.profile import (
    cramers_v,
    gamma_assoc,
    theil_u,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, ["x", "y"])


# ---------------------------------------------------------------------------
# cramers_v
# ---------------------------------------------------------------------------


def test_cramers_v_perfect_association_is_one(spark):
    rows = [("a", "p")] * 5 + [("b", "q")] * 5
    r = cramers_v(_pairs(spark, rows), "x", "y").collect()[0]
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-6)
    assert r["chi2"] == pytest.approx(10.0, abs=1e-6)


def test_cramers_v_independent_is_zero(spark):
    rows = [
        (x, y) for x in ("a", "b") for y in ("p", "q") for _ in range(5)
    ]
    r = cramers_v(_pairs(spark, rows), "x", "y").collect()[0]
    assert r["cramers_v"] == pytest.approx(0.0, abs=1e-6)


def test_cramers_v_absent_cell_remainder(spark):
    # 2x2 with one empty cell: chi2 must include the absent cell's
    # expected count (checked against the dense-table formula)
    rows = [("a", "p")] * 4 + [("a", "q")] * 2 + [("b", "p")] * 3
    r = cramers_v(_pairs(spark, rows), "x", "y").collect()[0]
    n = 9.0
    obs = {("a", "p"): 4, ("a", "q"): 2, ("b", "p"): 3, ("b", "q"): 0}
    na = {"a": 6, "b": 3}
    nb = {"p": 7, "q": 2}
    chi2 = sum(
        (obs[(x, y)] - na[x] * nb[y] / n) ** 2 / (na[x] * nb[y] / n)
        for x in na
        for y in nb
    )
    assert r["chi2"] == pytest.approx(chi2, abs=1e-5)


def test_cramers_v_constant_column_null(spark):
    rows = [("a", "p"), ("a", "q")]
    r = cramers_v(_pairs(spark, rows), "x", "y").collect()[0]
    assert r["cramers_v"] is None


# ---------------------------------------------------------------------------
# theil_u
# ---------------------------------------------------------------------------


def test_theil_u_deterministic_mapping(spark):
    # y fully determines x -> U(x|y) = 1; x does not determine y
    rows = [("a", "p"), ("a", "q"), ("b", "r"), ("b", "s")] * 3
    r = theil_u(_pairs(spark, rows), "x", "y").collect()[0]
    assert r["u_x_given_y"] == pytest.approx(1.0, abs=1e-6)
    assert r["u_y_given_x"] == pytest.approx(0.5, abs=1e-6)


def test_theil_u_independent_zero(spark):
    rows = [
        (x, y) for x in ("a", "b") for y in ("p", "q") for _ in range(4)
    ]
    r = theil_u(_pairs(spark, rows), "x", "y").collect()[0]
    assert r["mutual_info"] == pytest.approx(0.0, abs=1e-6)
    assert r["u_x_given_y"] == pytest.approx(0.0, abs=1e-6)


def test_theil_u_entropy_values(spark):
    rows = [("a", "p")] * 3 + [("b", "p")]
    r = theil_u(_pairs(spark, rows), "x", "y").collect()[0]
    h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert r["h_x"] == pytest.approx(h, abs=1e-6)
    assert r["u_y_given_x"] is None  # H(y) = 0


# ---------------------------------------------------------------------------
# gamma_assoc
# ---------------------------------------------------------------------------


def _gamma_replay(rows):
    c = d = 0
    for (x1, y1), (x2, y2) in itertools.combinations(rows, 2):
        if x1 == x2 or y1 == y2:
            continue
        if (x1 < x2) == (y1 < y2):
            c += 1
        else:
            d += 1
    return c, d


def test_gamma_matches_pair_replay(spark):
    rows = [
        (1, 1), (1, 2), (2, 1), (2, 3), (3, 2), (3, 3), (1, 1),
        (2, 2), (3, 1), (3, 3),
    ]
    r = gamma_assoc(_pairs(spark, rows), "x", "y").collect()[0]
    c, d = _gamma_replay(rows)
    assert (r["concordant_pairs"], r["discordant_pairs"]) == (c, d)
    assert r["gamma"] == pytest.approx((c - d) / (c + d), abs=1e-6)


def test_gamma_monotone_is_one(spark):
    rows = [(i, i * 10) for i in range(6)]
    r = gamma_assoc(_pairs(spark, rows), "x", "y").collect()[0]
    assert r["gamma"] == pytest.approx(1.0)


def test_gamma_constant_column_null(spark):
    rows = [(1, 5), (2, 5), (3, 5)]
    r = gamma_assoc(_pairs(spark, rows), "x", "y").collect()[0]
    assert r["gamma"] is None


# ---------------------------------------------------------------------------
# bowker_test
# ---------------------------------------------------------------------------


def test_bowker_hand_computed(spark):
    rows = (
        [("a", "a")] * 5 + [("a", "b")] * 3 + [("b", "a")]
        + [("b", "b")] * 4 + [("b", "c")] * 2 + [("c", "b")]
        + [("c", "c")] * 3
    )
    r = bowker_test(_pairs(spark, rows), "x", "y").collect()[0]
    # (a,b): (3-1)^2/4 = 1 ; (b,c): (2-1)^2/3 = 1/3 ; (a,c): absent
    assert r["df_cells"] == 2 and r["n_discordant"] == 7
    assert r["bowker_stat"] == pytest.approx(1 + 1 / 3.0, abs=1e-6)


def test_bowker_symmetric_matrix_zero(spark):
    rows = [("a", "b")] * 2 + [("b", "a")] * 2 + [("a", "a")] * 3
    r = bowker_test(_pairs(spark, rows), "x", "y").collect()[0]
    assert r["bowker_stat"] == pytest.approx(0.0, abs=1e-6)


def test_bowker_no_discordance_null(spark):
    rows = [("a", "a"), ("b", "b")]
    r = bowker_test(_pairs(spark, rows), "x", "y").collect()[0]
    assert r["bowker_stat"] is None and r["df_cells"] == 0
