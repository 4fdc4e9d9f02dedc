"""Round-11 sixth batch: Newey–West HAC mean CI — the
autocorrelation-robust interval durbin_watson motivates. NumPy
kernel replay + degeneracy contracts."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from gbif_filter_python_spark.operators.analytics import hac_mean_ci


def _daily(spark, ys):
    rows = [
        (datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i), float(y))
        for i, y in enumerate(ys)
    ]
    return spark.createDataFrame(rows, ["ts", "y"])


def _hac_replay(ys, L):
    x = np.array(ys, dtype=float)
    n = len(x)
    e = x - x.mean()
    var = e @ e / n
    for lag in range(1, L + 1):
        g = float((e[lag:] * e[:-lag]).sum()) / n
        var += 2.0 * (1.0 - lag / (L + 1.0)) * g
    return x.mean(), max(var, 0.0), n


def test_hac_matches_numpy_kernel(spark):
    ys = [5, 9, 4, 11, 6, 13, 3, 10, 7, 12, 5, 9, 8, 14, 6]
    r = hac_mean_ci(_daily(spark, ys), "ts", "y", max_lag=3).collect()[0]
    mu, var, n = _hac_replay(ys, 3)
    assert r["n_days"] == n
    assert r["mean"] == pytest.approx(mu, abs=1e-5)
    assert r["se_hac"] == pytest.approx((var / n) ** 0.5, abs=1e-5)
    assert r["ci95_lo"] == pytest.approx(
        mu - 1.9599639845400545 * (var / n) ** 0.5, abs=1e-4
    )


def test_hac_positive_autocorrelation_widens(spark):
    # strongly positively autocorrelated series: HAC se > naive se
    ys, v = [], 0.0
    vals = [1, 2, 1, 3, 2, 1, 2, 3]
    for i in range(40):
        v = 0.9 * v + vals[i % 8]
        ys.append(v)
    r = hac_mean_ci(_daily(spark, ys), "ts", "y", max_lag=7).collect()[0]
    assert r["ratio"] > 1.0


def test_hac_too_short_yields_nulls(spark):
    r = hac_mean_ci(
        _daily(spark, [1, 2, 3]), "ts", "y", max_lag=7
    ).collect()[0]
    assert r["se_hac"] is None and r["ci95_lo"] is None


def test_hac_rejects_bad_lag(spark):
    with pytest.raises(ValueError):
        hac_mean_ci(_daily(spark, [1, 2]), "ts", "y", max_lag=0)


# ---------------------------------------------------------------------------
# wasserstein_1d
# ---------------------------------------------------------------------------

from gbif_filter_python_spark.operators.profile import wasserstein_1d


def _grp(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + [
        ("b", float(v)) for v in b_vals
    ]
    return spark.createDataFrame(rows, ["g", "v"])


def test_w1_pure_shift_equals_shift(spark):
    df = _grp(spark, [1, 2, 3, 4], [3, 4, 5, 6])
    r = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    assert r["w1_distance"] == pytest.approx(2.0, abs=1e-6)
    assert r["w1_normalized"] == pytest.approx(2.0 / 5.0, abs=1e-6)


def test_w1_identical_distributions_zero(spark):
    df = _grp(spark, [1, 5, 9], [1, 5, 9])
    r = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    assert r["w1_distance"] == pytest.approx(0.0, abs=1e-9)


def test_w1_matches_sorted_replay_with_ties(spark):
    a = [1, 1, 2, 7, 7, 9]
    b = [2, 2, 3, 5, 9, 9]
    df = _grp(spark, a, b)
    r = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    # replay: integral of |ECDF diff| over segments between distinct
    # pooled values
    vals = sorted(set(a) | set(b))
    import bisect

    def ecdf(xs, x):
        return bisect.bisect_right(sorted(xs), x) / len(xs)

    w1 = sum(
        abs(ecdf(a, v) - ecdf(b, v)) * (vals[i + 1] - v)
        for i, v in enumerate(vals[:-1])
    )
    assert r["w1_distance"] == pytest.approx(w1, abs=1e-6)


def test_w1_missing_group_empty_frame(spark):
    df = _grp(spark, [1, 2], [])
    assert wasserstein_1d(df, "g", "v", "a", "b").count() == 0


# ---------------------------------------------------------------------------
# drift_report
# ---------------------------------------------------------------------------

from gbif_filter_python_spark.operators.profile import (
    drift_report,
    ks_test,
)


def test_drift_report_matches_single_column_ops(spark):
    rows = [
        ("a", 1.0, 10.0), ("a", 2.0, 20.0), ("a", 3.0, 30.0),
        ("b", 3.0, 10.0), ("b", 4.0, 20.0), ("b", 5.0, 30.0),
    ]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {
        r["column"]: r
        for r in drift_report(df, "g", ["x", "y"], "a", "b").collect()
    }
    ks_x = ks_test(df, "g", "x", "a", "b").collect()[0]
    w1_x = wasserstein_1d(df, "g", "x", "a", "b").collect()[0]
    assert out["x"]["ks_d"] == ks_x["d_stat"]
    assert out["x"]["w1_distance"] == w1_x["w1_distance"]
    assert out["x"]["mean_a"] == pytest.approx(2.0)
    assert out["x"]["mean_b"] == pytest.approx(4.0)
    # identical column: zero drift
    assert out["y"]["ks_d"] == pytest.approx(0.0)
    assert out["y"]["w1_distance"] == pytest.approx(0.0)


def test_drift_report_null_values_excluded_per_column(spark):
    rows = [("a", 1.0, None), ("a", 2.0, 5.0), ("b", 3.0, 5.0)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {
        r["column"]: r
        for r in drift_report(df, "g", ["x", "y"], "a", "b").collect()
    }
    assert out["x"]["n_a"] == 2 and out["y"]["n_a"] == 1


def test_drift_report_empty_cohort_nulls(spark):
    rows = [("a", 1.0), ("a", 2.0)]
    df = spark.createDataFrame(rows, ["g", "x"])
    out = drift_report(df, "g", ["x"], "a", "b").collect()
    assert out[0]["ks_d"] is None and out[0]["w1_distance"] is None


def test_drift_report_rejects_empty_cols(spark):
    df = spark.createDataFrame([("a", 1.0)], ["g", "x"])
    with pytest.raises(ValueError):
        drift_report(df, "g", [], "a", "b")
