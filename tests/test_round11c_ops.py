"""Round-11 third batch: equivalence testing (tost_equivalence),
serial-correlation diagnostics (durbin_watson, runs_test), variance
homogeneity (bartlett_test), and embedding label coherence
(knn_label_consistency). Hand-computed cases + NULL contracts."""

from __future__ import annotations

import datetime
import math

import numpy as np
import pytest

from gbif_filter_python_spark.operators.analytics import (
    durbin_watson,
    runs_test,
    tost_equivalence,
)
from gbif_filter_python_spark.operators.profile import bartlett_test
from gbif_filter_python_spark.operators.similarity import (
    knn_label_consistency,
)


# ---------------------------------------------------------------------------
# tost_equivalence
# ---------------------------------------------------------------------------


def _arms(spark, a_vals, b_vals):
    rows = [(0, float(v)) for v in a_vals] + [(1, float(v)) for v in b_vals]
    return spark.createDataFrame(rows, ["arm", "v"])


def test_tost_equivalent_when_identical_means(spark):
    df = _arms(spark, [10, 11, 9, 10], [10, 9, 11, 10])
    r = tost_equivalence(df, "arm", "v", 0, 1, margin=5.0).collect()[0]
    assert r["delta"] == pytest.approx(0.0, abs=1e-6)
    assert r["equivalent_05"] is True
    # hand: se = sqrt(va/4 + vb/4); z_lower = 5/se
    va = np.var([10, 11, 9, 10], ddof=1)
    se = math.sqrt(va / 4 * 2)
    assert r["z_lower"] == pytest.approx(5.0 / se, abs=1e-4)


def test_tost_not_equivalent_when_far_apart(spark):
    df = _arms(spark, [0, 1, 0, 1], [10, 11, 10, 11])
    r = tost_equivalence(df, "arm", "v", 0, 1, margin=2.0).collect()[0]
    assert r["equivalent_05"] is False  # delta ~ 10 >> margin


def test_tost_degenerate_arm_nulls(spark):
    df = _arms(spark, [1, 2, 3], [7])  # treatment n=1
    r = tost_equivalence(df, "arm", "v", 0, 1, margin=1.0).collect()[0]
    assert r["se"] is None and r["equivalent_05"] is None


def test_tost_rejects_nonpositive_margin(spark):
    df = _arms(spark, [1], [2])
    with pytest.raises(ValueError):
        tost_equivalence(df, "arm", "v", 0, 1, margin=0.0)


# ---------------------------------------------------------------------------
# durbin_watson / runs_test
# ---------------------------------------------------------------------------


def _daily(spark, ys):
    rows = [
        (datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i), float(y))
        for i, y in enumerate(ys)
    ]
    return spark.createDataFrame(rows, ["ts", "y"])


def _dw_expected(ys):
    y = np.array(ys, dtype=float)
    t = np.arange(1, len(y) + 1, dtype=float)
    b, a = np.polyfit(t, y, 1)
    e = y - (a + b * t)
    return float(((e[1:] - e[:-1]) ** 2).sum() / (e**2).sum())


def test_dw_matches_numpy_replay(spark):
    ys = [3, 8, 2, 9, 4, 10, 1, 7, 5, 12]
    r = durbin_watson(_daily(spark, ys), "ts", "y").collect()[0]
    assert r["n_days"] == 10
    assert r["dw_stat"] == pytest.approx(_dw_expected(ys), abs=1e-4)


def test_dw_alternating_residuals_near_four(spark):
    ys = [1, 9, 1, 9, 1, 9, 1, 9]  # strong negative lag-1 correlation
    r = durbin_watson(_daily(spark, ys), "ts", "y").collect()[0]
    assert r["dw_stat"] > 3.0


def test_dw_perfect_trend_null(spark):
    r = durbin_watson(
        _daily(spark, [1, 2, 3, 4, 5]), "ts", "y"
    ).collect()[0]
    assert r["dw_stat"] is None  # zero residuals -> see = 0


def test_runs_alternating_series_many_runs(spark):
    ys = [1, 9, 1, 9, 1, 9, 1, 9, 1, 9]
    r = runs_test(_daily(spark, ys), "ts", "y").collect()[0]
    # median 5, 5 above / 5 below, alternating -> 10 runs
    assert (r["n_above"], r["n_below"], r["n_runs"]) == (5, 5, 10)
    mu = 2 * 5 * 5 / 10.0 + 1
    var = 2 * 5 * 5 * (2 * 5 * 5 - 10) / (10.0**2 * 9)
    assert r["z_stat"] == pytest.approx((10 - mu) / math.sqrt(var), abs=1e-4)


def test_runs_trending_series_few_runs(spark):
    ys = [1, 2, 3, 4, 10, 11, 12, 13]
    r = runs_test(_daily(spark, ys), "ts", "y").collect()[0]
    assert r["n_runs"] == 2 and r["z_stat"] < 0


def test_runs_all_same_side_null(spark):
    # every value equals the median -> all excluded -> NULL
    r = runs_test(_daily(spark, [5, 5, 5, 5]), "ts", "y").collect()[0]
    assert r["z_stat"] is None


# ---------------------------------------------------------------------------
# bartlett_test
# ---------------------------------------------------------------------------


def test_bartlett_matches_scipy_formula(spark):
    groups = {
        "A": [1.0, 2.0, 3.0, 4.0],
        "B": [2.0, 4.0, 6.0, 8.0],
        "C": [1.0, 1.5, 2.0, 2.5],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = bartlett_test(df, "g", "v").collect()[0]
    ns = {g: len(vs) for g, vs in groups.items()}
    vs_ = {g: np.var(v, ddof=1) for g, v in groups.items()}
    N, k = sum(ns.values()), len(groups)
    sp2 = sum((ns[g] - 1) * vs_[g] for g in groups) / (N - k)
    t_num = (N - k) * math.log(sp2) - sum(
        (ns[g] - 1) * math.log(vs_[g]) for g in groups
    )
    c = 1 + (sum(1.0 / (ns[g] - 1) for g in groups) - 1.0 / (N - k)) / (
        3 * (k - 1)
    )
    assert r["k_tested"] == 3 and r["n"] == N
    assert r["pooled_var"] == pytest.approx(sp2, abs=1e-4)
    assert r["bartlett_stat"] == pytest.approx(t_num / c, abs=1e-4)


def test_bartlett_excludes_degenerate_groups(spark):
    rows = [("A", 1.0), ("A", 2.0), ("B", 5.0), ("C", 3.0), ("C", 3.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = bartlett_test(df, "g", "v").collect()[0]
    # B is a singleton, C has zero variance -> both excluded
    assert r["k_groups"] == 3 and r["k_tested"] == 1
    assert r["k_excluded"] == 2
    assert r["bartlett_stat"] is None  # < 2 surviving groups


# ---------------------------------------------------------------------------
# knn_label_consistency
# ---------------------------------------------------------------------------


def _labeled_emb(spark, vecs_labels):
    return spark.createDataFrame(
        [
            (i, [float(x) for x in v], lab)
            for i, (v, lab) in enumerate(vecs_labels)
        ],
        ["vec_id", "embedding", "label"],
    )


def test_knn_perfectly_separated_labels(spark):
    # two tight clusters far apart, labels follow clusters
    data = [([1.0, 0.01 * i], 0) for i in range(4)] + [
        ([-1.0, 0.01 * i], 1) for i in range(4)
    ]
    df = _labeled_emb(spark, data)
    out = {
        r["label"]: r
        for r in knn_label_consistency(df, k=3, sample_n=8).collect()
    }
    assert out[0]["mean_consistency"] == pytest.approx(1.0)
    assert out[1]["mean_consistency"] == pytest.approx(1.0)
    assert out[0]["n_anchors"] == 4


def test_knn_label_blind_embedding_mixes(spark):
    # identical vectors, alternating labels: neighbors are ties broken
    # by id; consistency must be strictly below 1 for both labels
    data = [([1.0, 1.0], i % 2) for i in range(8)]
    df = _labeled_emb(spark, data)
    out = knn_label_consistency(df, k=4, sample_n=8).collect()
    for r in out:
        assert r["mean_consistency"] < 1.0


def test_knn_excludes_null_labels(spark):
    data = [(0, [1.0, 0.0], 0), (1, [1.0, 0.1], None), (2, [0.9, 0.0], 0)]
    df = spark.createDataFrame(data, ["vec_id", "embedding", "label"])
    out = knn_label_consistency(df, k=2, sample_n=4).collect()
    assert {r["label"] for r in out} == {0}
    # the NULL-label row is not a neighbor candidate either: with only
    # 2 valid rows, each anchor has exactly 1 neighbor (the other)
    assert all(r["mean_consistency"] == pytest.approx(1.0) for r in out)


def test_knn_rejects_bad_sample_n(spark):
    df = _labeled_emb(spark, [([1.0, 0.0], 0)])
    with pytest.raises(ValueError):
        knn_label_consistency(df, sample_n=0)
