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
