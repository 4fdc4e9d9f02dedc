"""Round-11 second batch: stratified/paired/post-hoc/causal stats
(cmh_test, mcnemar_test, tukey_hsd, granger_causality), embedding
datasheet spectra (participation_ratio, uniformity), and corpus
structure (entropy_rate, kfold_balance). Hand-computed cases plus
degenerate-input NULL contracts."""

from __future__ import annotations

import math

import numpy as np
import pytest

from gbif_filter_python_spark.operators.analytics import (
    cmh_test,
    granger_causality,
    mcnemar_test,
)
from gbif_filter_python_spark.operators.corpus import (
    entropy_rate,
    kfold_balance,
)
from gbif_filter_python_spark.operators.linalg import participation_ratio
from gbif_filter_python_spark.operators.profile import tukey_hsd
from gbif_filter_python_spark.operators.similarity import uniformity


# ---------------------------------------------------------------------------
# cmh_test
# ---------------------------------------------------------------------------


def _cmh_rows(spark, rows):
    return spark.createDataFrame(rows, ["s", "e", "o"])


def test_cmh_hand_computed_single_stratum(spark):
    # one stratum: a=2, n1=3, m1=3, n=6
    rows = (
        [("s1", True, True)] * 2
        + [("s1", True, False)]
        + [("s1", False, True)]
        + [("s1", False, False)] * 2
    )
    r = cmh_test(_cmh_rows(spark, rows), "s", "e", "o").collect()[0]
    e_k = 3 * 3 / 6.0
    v_k = 3 * 3 * 3 * 3 / (36.0 * 5)
    assert r["n_strata"] == 1 and r["n_rows"] == 6 and r["sum_a"] == 2
    assert r["sum_e"] == pytest.approx(e_k, abs=1e-6)
    assert r["chi2_cmh"] == pytest.approx(
        (2 - e_k) ** 2 / v_k, abs=1e-5
    )
    # OR_MH = (a*d/n) / (b*c/n) = (2*2/6)/(1*1/6) = 4
    assert r["or_mh"] == pytest.approx(4.0, abs=1e-6)


def test_cmh_excludes_singleton_strata_and_nulls_when_degenerate(spark):
    rows = [("only", True, True)]  # n=1 -> V undefined -> excluded
    r = cmh_test(_cmh_rows(spark, rows), "s", "e", "o").collect()[0]
    assert r["n_strata"] == 0
    assert r["chi2_cmh"] is None and r["or_mh"] is None


def test_cmh_aggregates_across_strata(spark):
    rows = (
        [("s1", True, True)] * 2
        + [("s1", False, False)] * 2
        + [("s2", True, False)] * 2
        + [("s2", False, True)] * 2
    )
    r = cmh_test(_cmh_rows(spark, rows), "s", "e", "o").collect()[0]
    assert r["n_strata"] == 2 and r["n_rows"] == 8
    # s1: a=2, E=1, s2: a=0, E=1 -> dev = (2+0) - 2 = 0 ... chi2 = 0
    assert r["chi2_cmh"] == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------------------
# mcnemar_test
# ---------------------------------------------------------------------------


def test_mcnemar_hand_computed(spark):
    rows = (
        [(True, True)] * 4
        + [(False, False)] * 3
        + [(True, False)] * 3
        + [(False, True)]
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    r = mcnemar_test(df, "a", "b").collect()[0]
    assert (r["n_pairs"], r["n_both"], r["n_neither"]) == (11, 4, 3)
    assert (r["n_a_only"], r["n_b_only"]) == (3, 1)
    assert r["chi2_mcnemar"] == pytest.approx((3 - 1) ** 2 / 4.0, abs=1e-6)


def test_mcnemar_identical_classifiers_null(spark):
    df = spark.createDataFrame([(True, True), (False, False)], ["a", "b"])
    r = mcnemar_test(df, "a", "b").collect()[0]
    assert r["chi2_mcnemar"] is None


# ---------------------------------------------------------------------------
# tukey_hsd
# ---------------------------------------------------------------------------


def test_tukey_hand_computed_two_groups(spark):
    rows = [("A", 1.0), ("A", 3.0), ("B", 5.0), ("B", 9.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = tukey_hsd(df, "g", "v").collect()[0]
    # ssw = 2 + 8 = 10, msw = 10/(4-2) = 5
    se = math.sqrt(5 / 2.0 * (1 / 2.0 + 1 / 2.0))
    assert (r["grp_a"], r["grp_b"]) == ("A", "B")
    assert r["mean_diff"] == pytest.approx(-5.0)
    assert r["k_groups"] == 2 and r["n_total"] == 4
    assert r["q_stat"] == pytest.approx(5.0 / se, abs=1e-6)


def test_tukey_matches_anova_pooling_three_groups(spark):
    rows = [
        ("A", v) for v in (1.0, 2.0, 3.0)
    ] + [("B", v) for v in (4.0, 6.0)] + [("C", v) for v in (9.0, 11.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {
        (r["grp_a"], r["grp_b"]): r for r in tukey_hsd(df, "g", "v").collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ssw = 2 * 1.0 + 1 * 2.0 + 1 * 2.0  # (n-1)*var per group
    msw = ssw / (7 - 3)
    q_ab = abs(2.0 - 5.0) / math.sqrt(msw / 2 * (1 / 3 + 1 / 2))
    assert out[("A", "B")]["q_stat"] == pytest.approx(q_ab, abs=1e-6)


def test_tukey_all_singletons_null_q(spark):
    df = spark.createDataFrame([("A", 1.0), ("B", 2.0)], ["g", "v"])
    r = tukey_hsd(df, "g", "v").collect()[0]
    assert r["q_stat"] is None  # N == k -> MSW undefined


# ---------------------------------------------------------------------------
# granger_causality
# ---------------------------------------------------------------------------


def _series_df(spark, xs, ys):
    import datetime

    rows = [
        (datetime.datetime(2024, 1, 1 + i), float(x), float(y))
        for i, (x, y) in enumerate(zip(xs, ys))
    ]
    return spark.createDataFrame(rows, ["ts", "x", "y"])


def test_granger_matches_numpy_ols(spark):
    rng = [3, 7, 2, 9, 5, 8, 1, 6, 4, 10, 2, 7]
    xs = rng
    # y depends on lagged x plus a bit of lagged y
    ys = [5]
    for i in range(1, len(xs)):
        ys.append(2 * xs[i - 1] + (ys[i - 1] % 3) + 1)
    r = granger_causality(
        _series_df(spark, xs, ys), "ts", "x", "y"
    ).collect()[0]
    y = np.array(ys[1:], dtype=float)
    y1 = np.array(ys[:-1], dtype=float)
    x1 = np.array(xs[:-1], dtype=float)
    n = len(y)
    Xf = np.column_stack([np.ones(n), y1, x1])
    Xr = np.column_stack([np.ones(n), y1])
    bf, *_ = np.linalg.lstsq(Xf, y, rcond=None)
    br, *_ = np.linalg.lstsq(Xr, y, rcond=None)
    rss_f = float(((y - Xf @ bf) ** 2).sum())
    rss_r = float(((y - Xr @ br) ** 2).sum())
    f_exp = (rss_r - rss_f) * (n - 3) / rss_f
    assert r["n_obs"] == n
    assert r["beta_y_lag"] == pytest.approx(bf[1], abs=1e-4)
    assert r["beta_x_lag"] == pytest.approx(bf[2], abs=1e-4)
    assert r["f_stat"] == pytest.approx(f_exp, rel=1e-3)


def test_granger_too_short_yields_nulls(spark):
    r = granger_causality(
        _series_df(spark, [1, 2, 3], [4, 5, 6]), "ts", "x", "y"
    ).collect()[0]
    assert r["n_obs"] == 2  # 3 days -> 2 lagged obs
    assert r["beta_x_lag"] is None and r["f_stat"] is None


def test_granger_constant_lag_is_singular_null(spark):
    # constant x -> c22 = 0 and det = 0 -> NULL betas/F
    r = granger_causality(
        _series_df(spark, [5] * 8, [1, 4, 2, 6, 3, 8, 5, 7]),
        "ts",
        "x",
        "y",
    ).collect()[0]
    assert r["beta_x_lag"] is None and r["f_stat"] is None


# ---------------------------------------------------------------------------
# participation_ratio
# ---------------------------------------------------------------------------


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    )


def test_pr_rank_one_is_one(spark):
    r = participation_ratio(
        _emb(spark, [[1, 0], [2, 0], [3, 0]]), dim=2
    ).collect()[0]
    assert r["d"] == 2
    assert r["participation_ratio"] == pytest.approx(1.0, abs=1e-4)
    assert r["pr_fraction"] == pytest.approx(0.5, abs=1e-4)


def test_pr_isotropic_is_d(spark):
    r = participation_ratio(
        _emb(spark, [[1, 0], [0, 1], [-1, 0], [0, -1]]), dim=2
    ).collect()[0]
    assert r["participation_ratio"] == pytest.approx(2.0, abs=1e-4)
    assert r["pr_fraction"] == pytest.approx(1.0, abs=1e-4)


def test_pr_constant_embeddings_null(spark):
    r = participation_ratio(
        _emb(spark, [[1, 1], [1, 1]]), dim=2
    ).collect()[0]
    assert r["participation_ratio"] is None


# ---------------------------------------------------------------------------
# uniformity
# ---------------------------------------------------------------------------


def test_uniformity_identical_points_zero(spark):
    # all pairs have cos=1 -> ||x-y||^2 = 0 -> kernel 1 -> log(mean)=0
    r = uniformity(_emb(spark, [[1, 0]] * 5), sample_n=5).collect()[0]
    assert r["n_anchors"] == 5 and r["n_corpus"] == 5
    assert r["n_pairs"] == 20  # 5*5 minus self pairs
    assert r["uniformity"] == pytest.approx(0.0, abs=1e-6)


def test_uniformity_orthogonal_matches_closed_form(spark):
    # corpus = the 2 standard basis vectors; anchors = both.
    # cross pairs (4 total, 2 self-excluded): cos=0 -> exp(-2*2)
    r = uniformity(_emb(spark, [[1, 0], [0, 1]]), sample_n=2).collect()[0]
    assert r["n_pairs"] == 2
    assert r["uniformity"] == pytest.approx(-4.0, abs=1e-6)


def test_uniformity_excludes_zero_norm_vectors(spark):
    r = uniformity(
        _emb(spark, [[1, 0], [0, 0], [0, 1]]), sample_n=3
    ).collect()[0]
    assert r["n_corpus"] == 2


# ---------------------------------------------------------------------------
# entropy_rate
# ---------------------------------------------------------------------------


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_entropy_rate_deterministic_sequence_is_zero(spark):
    # next char fully determined by current char
    r = entropy_rate(_docs(spark, ["ababababab"])).collect()[0]
    assert r["n_pairs"] == 9
    assert r["entropy_rate_bits"] == pytest.approx(0.0, abs=1e-6)


def test_entropy_rate_hand_computed(spark):
    # "aabb": pairs aa, ab, bb (each once). H(pair)=log2(3);
    # prefixes a:2, b:1 -> H(prefix)=log2(3)-(2/3)
    r = entropy_rate(_docs(spark, ["aabb"])).collect()[0]
    h_big = math.log2(3)
    h_pre = math.log2(3) - 2 / 3.0
    assert r["n_distinct_bigrams"] == 3
    assert r["h_bigram_bits"] == pytest.approx(h_big, abs=1e-6)
    assert r["h_prefix_bits"] == pytest.approx(h_pre, abs=1e-6)
    assert r["entropy_rate_bits"] == pytest.approx(
        h_big - h_pre, abs=1e-6
    )


def test_entropy_rate_short_docs_contribute_nothing(spark):
    r = entropy_rate(_docs(spark, ["x", "", "ab"])).collect()[0]
    assert r["n_pairs"] == 1  # only "ab"


# ---------------------------------------------------------------------------
# kfold_balance
# ---------------------------------------------------------------------------


def test_kfold_counts_and_expectations(spark):
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 2)) for i in range(200)], ["doc_id", "src"]
    )
    out = kfold_balance(df, "doc_id", "src", k=4).collect()
    total = sum(r["n_obs"] for r in out)
    assert total == 200
    # densified: every (fold-with-data, stratum-with-data) cell present
    folds = {r["fold"] for r in out}
    strata = {r["stratum"] for r in out}
    assert len(out) == len(folds) * len(strata)
    for r in out:
        if r["n_expected"] and r["n_expected"] > 0:
            assert r["ratio"] == pytest.approx(
                r["n_obs"] / r["n_expected"], abs=1e-4
            )


def test_kfold_chi2_cell_formula(spark):
    df = spark.createDataFrame(
        [(i, "a") for i in range(50)], ["doc_id", "src"]
    )
    out = kfold_balance(df, "doc_id", "src", k=3).collect()
    for r in out:
        e = r["n_expected"]
        assert r["chi2_cell"] == pytest.approx(
            (r["n_obs"] - e) ** 2 / e, abs=1e-4
        )


def test_kfold_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "src"])
    with pytest.raises(ValueError):
        kfold_balance(df, "doc_id", "src", k=1)
