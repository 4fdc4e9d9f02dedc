"""Unit tests for the round-7 statistics block: Welch t-test, ACF,
Jensen-Shannon divergence, Kaplan-Meier survival, Markov transitions,
and type-token ratio — hand-computed or NumPy/SciPy-free ground truth."""

from __future__ import annotations

import math

import numpy as np

from gbif_filter_python_spark.operators.corpus import type_token_ratio
from pyspark.sql import functions as F

from gbif_filter_python_spark.operators.profile import (
    acf_lags,
    anova_f,
    ccf_lags,
    forecast_eval,
    js_divergence,
    kaplan_meier,
    levene_test,
    welch_ttest,
)
from gbif_filter_python_spark.operators.temporal import markov_transitions


def test_welch_ttest_matches_numpy(spark):
    rng = np.random.default_rng(11)
    a = rng.normal(10.0, 2.0, size=50)
    b = rng.normal(12.0, 3.0, size=40)
    rows = [("A", float(v)) for v in a] + [("B", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    (r,) = welch_ttest(df, "g", "v").collect()
    na, nb = len(a), len(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / na + vb / nb
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    d = (a.mean() - b.mean()) / math.sqrt(
        ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    )
    assert (r["grp_a"], r["grp_b"], r["n_a"], r["n_b"]) == ("A", "B", na, nb)
    assert abs(r["t_stat"] - t) < 1e-5
    assert abs(r["df"] - dof) < 0.01 + 1e-9
    assert abs(r["cohen_d"] - d) < 1e-5


def test_welch_ttest_all_pairs_and_tiny_group(spark):
    rows = (
        [("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 5.0), ("C", 9.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {(r["grp_a"], r["grp_b"]): r for r in welch_ttest(df, "g", "v").collect()}
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    # n=1 group: var_samp undefined -> NULL statistics, row still present
    assert got[("A", "C")]["t_stat"] is None


def test_acf_alternating_series(spark):
    # Daily values alternating 0, 10: ACF(lag1) = -1, ACF(lag2) = +1.
    rows = [
        (f"2024-01-{d:02d} 00:00:00", float(10 * (d % 2))) for d in range(1, 21)
    ]
    df = spark.createDataFrame(rows, "ts string, v double").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "v"
    )
    got = {r["lag"]: r for r in acf_lags(df, "ts", "v", max_lag=3).collect()}
    assert got[1]["n_pairs"] == 19 and got[2]["n_pairs"] == 18
    assert abs(got[1]["acf"] + 1.0) < 1e-9
    assert abs(got[2]["acf"] - 1.0) < 1e-9
    assert abs(got[3]["acf"] + 1.0) < 1e-9


def test_acf_sums_multiple_rows_per_day(spark):
    rows = [("2024-01-01 05:00:00", 4.0), ("2024-01-01 07:00:00", 6.0),
            ("2024-01-02 01:00:00", 1.0), ("2024-01-03 01:00:00", 9.0)]
    df = spark.createDataFrame(rows, "ts string, v double").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "v"
    )
    got = {r["lag"]: r["n_pairs"] for r in acf_lags(df, "ts", "v", 2).collect()}
    assert got == {1: 2, 2: 1}  # 3 daily points after the sum


def test_jsd_zero_for_identical_and_ln2_for_disjoint(spark):
    # One group == global -> JSD 0 exactly.
    df = spark.createDataFrame(
        [("A", float(v)) for v in range(100)], "g string, v double"
    )
    (r,) = js_divergence(df, "g", "v", n_bins=10).collect()
    assert r["jsd"] == 0.0
    # Two disjoint groups: each group's distance to the 50/50 mixture
    # is ln 2 bounded; here each group is fully disjoint from the other
    # half of the mixture -> JSD = 0.5*ln2 per group... verify by hand:
    # p = [1,0], q = [.5,.5]: JSD = .5*1*ln(1/.75)*... compute directly.
    df2 = spark.createDataFrame(
        [("L", 0.0)] * 30 + [("R", 100.0)] * 30, "g string, v double"
    )
    got = {r["g" "rp"]: r["jsd"] for r in js_divergence(df2, "g", "v", 2).collect()}
    p, q = np.array([1.0, 0.0]), np.array([0.5, 0.5])
    m = (p + q) / 2
    expect = 0.5 * np.sum(p[p > 0] * np.log(p[p > 0] / m[p > 0])) + 0.5 * np.sum(
        q * np.log(q / m)
    )
    assert abs(got["L"] - expect) < 1e-6 and abs(got["R"] - expect) < 1e-6


def test_kaplan_meier_hand_example(spark):
    # Keys with (first, last): lifetimes 0,0,2,5; global max 2024-01-11.
    # churn_days=3: churned iff last < max - 3d.
    rows = [
        (1, "2024-01-01", "2024-01-01"),   # t=0, last 01-01 -> churned
        (2, "2024-01-10", "2024-01-10"),   # t=0, censored (recent)
        (3, "2024-01-02", "2024-01-04"),   # t=2, churned
        (4, "2024-01-06", "2024-01-11"),   # t=5, censored (is the max)
    ]
    df = spark.createDataFrame(
        rows, "k int, f string, l string"
    ).selectExpr("k", "CAST(f AS TIMESTAMP) AS ts").union(
        spark.createDataFrame(rows, "k int, f string, l string").selectExpr(
            "k", "CAST(l AS TIMESTAMP) AS ts"
        )
    )
    got = {r["t_days"]: r for r in kaplan_meier(df, "k", "ts", churn_days=3).collect()}
    assert set(got) == {0, 2, 5}
    r0 = got[0]
    assert (r0["n_risk"], r0["d"], r0["censored"]) == (4, 1, 1)
    assert abs(r0["survival"] - 0.75) < 1e-9
    r2 = got[2]
    assert (r2["n_risk"], r2["d"]) == (2, 1)
    assert abs(r2["survival"] - 0.75 * 0.5) < 1e-9
    r5 = got[5]
    assert (r5["n_risk"], r5["d"], r5["censored"]) == (1, 0, 1)
    assert abs(r5["survival"] - 0.375) < 1e-9


def test_kaplan_meier_total_wipeout_hits_zero(spark):
    # Everyone churns at the same lifetime -> factor 0 -> S = 0 (the
    # ln(0) guard path: Spark ln(0) is NULL, the cum-min guard must
    # still produce exactly 0).
    rows = [(k, "2024-01-01", "2024-01-03") for k in range(3)]
    df = spark.createDataFrame(
        rows, "k int, f string, l string"
    ).selectExpr("k", "CAST(f AS TIMESTAMP) AS ts").union(
        spark.createDataFrame(rows, "k int, f string, l string").selectExpr(
            "k", "CAST(l AS TIMESTAMP) AS ts"
        )
    )
    # add a fresh key so the churners are strictly older than max-60d
    fresh = spark.createDataFrame(
        [(99, "2024-06-01 00:00:00")], "k int, ts string"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts")
    got = {
        r["t_days"]: r
        for r in kaplan_meier(df.union(fresh), "k", "ts").collect()
    }
    assert got[2]["d"] == 3
    # after the t=2 wipeout only key 99 (t=0, censored) remains
    assert got[2]["survival"] == 0.0


def test_markov_transitions_probs(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
        (2, 1, "a"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, "u int, ts int, s string")
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["prob"])
        for r in markov_transitions(df, "u", "ts", "s", "ts").collect()
    }
    # from 'a': a->b twice, a->c once; last events have no successor
    assert got[("a", "b")] == (2, 0.666667)
    assert got[("a", "c")] == (1, 0.333333)
    assert got[("b", "a")] == (1, 1.0)
    assert ("c", "a") not in got


def test_type_token_ratio_zero_shuffle_and_values(spark):
    df = spark.createDataFrame(
        [(1, "The the THE cat!"), (2, "a b c d"), (3, "  ...  ")],
        "doc_id long, text string",
    )
    out = type_token_ratio(df)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 2}  # doc 3 empty after normalization
    assert (got[1]["n_tokens"], got[1]["n_types"]) == (4, 2)
    assert got[1]["ttr"] == 0.5
    assert got[2]["ttr"] == 1.0
    # pure map: no exchange anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mutual_information_dependent_and_independent(spark):
    from gbif_filter_python_spark.operators.profile import mutual_information

    # Y == X: MI = H(X) = ln 2, NMI = 1.
    rows = [("a", "a")] * 10 + [("b", "b")] * 10
    (r,) = mutual_information(
        spark.createDataFrame(rows, "x string, y string"), "x", "y"
    ).collect()
    assert r["n"] == 20
    assert abs(r["mi"] - math.log(2)) < 1e-6
    assert abs(r["h_x"] - math.log(2)) < 1e-6
    assert abs(r["nmi"] - 1.0) < 1e-6
    # Independent uniform: MI = 0 (exactly balanced counts).
    rows2 = [(x, y) for x in "ab" for y in "cd" for _ in range(5)]
    (r2,) = mutual_information(
        spark.createDataFrame(rows2, "x string, y string"), "x", "y"
    ).collect()
    assert abs(r2["mi"]) < 1e-9
    # NULLs excluded from n
    rows3 = rows + [(None, "a"), ("a", None)]
    (r3,) = mutual_information(
        spark.createDataFrame(rows3, "x string, y string"), "x", "y"
    ).collect()
    assert r3["n"] == 20


def test_mann_kendall_monotone_and_flat(spark):
    from gbif_filter_python_spark.operators.profile import mann_kendall

    inc = [(f"2024-01-{d:02d} 00:00:00", 2.0 * d) for d in range(1, 11)]
    df = spark.createDataFrame(inc, "ts string, v double").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "v"
    )
    (r,) = mann_kendall(df, "ts", "v").collect()
    assert (r["n_days"], r["s"]) == (10, 45)  # all 45 pairs increasing
    assert abs(r["sen_slope"] - 2.0) < 1e-9
    # var = n(n-1)(2n+5)/18 = 10*9*25/18 = 125; z = 44/sqrt(125)
    assert abs(r["var_s"] - 125.0) < 1e-9
    assert abs(r["z"] - 44 / math.sqrt(125.0)) < 1e-5
    flat = [(f"2024-02-{d:02d} 00:00:00", 7.0) for d in range(1, 6)]
    df2 = spark.createDataFrame(flat, "ts string, v double").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "v"
    )
    (r2,) = mann_kendall(df2, "ts", "v").collect()
    assert (r2["s"], r2["z"]) == (0, 0.0)  # one 5-way tie group
    assert r2["var_s"] == 0.0


def test_inverted_postings_bands_and_order(spark):
    from gbif_filter_python_spark.operators.ranking import inverted_postings

    docs = [
        (10, "apple banana"),
        (2, "apple cherry"),
        (3, "apple cherry"),
        (4, "apple date"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["term"]: r for r in inverted_postings(df).collect()}
    # 'apple' df=4 > 0.9*4 -> dropped; singletons dropped; cherry kept
    assert set(got) == {"cherry"}
    assert got["cherry"]["df"] == 2
    assert got["cherry"]["postings"] == "2,3"
    # numeric (not lexicographic) posting order: doc 10 after doc 2
    got2 = {
        r["term"]: r["postings"]
        for r in inverted_postings(df, max_df_frac=1.0).collect()
    }
    assert got2["apple"] == "2,3,4,10"


# ---------------------------------------------------------------- r7b
# anova_f / levene_test / forecast_eval / ccf_lags


def _anova_truth(groups):
    k = len(groups)
    n = sum(len(g) for g in groups)
    gm = sum(float(sum(g)) for g in groups) / n
    ssb = sum(len(g) * (np.mean(g) - gm) ** 2 for g in groups)
    ssw = sum(float(np.var(g, ddof=1)) * (len(g) - 1) for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return k, n, f, ssb / (ssb + ssw)


def test_anova_f_matches_numpy(spark):
    rng = np.random.default_rng(7)
    groups = [
        rng.normal(10.0, 2.0, 40),
        rng.normal(11.0, 2.0, 35),
        rng.normal(9.5, 2.5, 45),
    ]
    rows = [
        (name, float(v))
        for name, g in zip("ABC", groups)
        for v in g
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    (r,) = anova_f(df, "g", "v").collect()
    k, n, f, eta = _anova_truth(groups)
    assert (r["k_groups"], r["n"]) == (k, n)
    assert (r["df_between"], r["df_within"]) == (k - 1, n - k)
    assert abs(r["f_stat"] - f) < 1e-5
    assert abs(r["eta_squared"] - eta) < 1e-6


def test_anova_f_identical_groups_zero_between(spark):
    rows = [("A", v) for v in (1.0, 2.0, 3.0)] + [
        ("B", v) for v in (1.0, 2.0, 3.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    (r,) = anova_f(df, "g", "v").collect()
    assert r["f_stat"] == 0.0
    assert r["eta_squared"] == 0.0


def test_levene_brown_forsythe_matches_manual(spark):
    # group A: spread 2x group B; medians differ — the median
    # centering must remove the location difference entirely.
    a = [1.0, 3.0, 5.0, 7.0, 9.0]
    b = [100.0, 101.0, 102.0, 103.0, 104.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    (r,) = levene_test(df, "g", "v").collect()
    za = [abs(v - 5.0) for v in a]
    zb = [abs(v - 102.0) for v in b]
    _, _, w, _ = _anova_truth([za, zb])
    assert (r["k_groups"], r["n"], r["df1"], r["df2"]) == (2, 10, 1, 8)
    assert abs(r["w_stat"] - w) < 1e-6


def test_forecast_eval_tiny_series(spark):
    # 6 days, season=2 → eval window rn > 2 (days 3..6)
    vals = [10.0, 20.0, 30.0, 10.0, 50.0, 30.0]
    rows = [
        (f"2024-01-0{i + 1}", v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "d string, v double").select(
        F.to_timestamp("d").alias("d"), "v"
    )
    out = {
        r["method"]: r
        for r in forecast_eval(df, "d", "v", season=2).collect()
    }
    assert set(out) == {"naive", "seasonal_naive", "moving_avg"}
    # naive errors on days 3..6: |30-20|,|10-30|,|50-10|,|30-50|
    naive_mae = (10 + 20 + 40 + 20) / 4
    assert out["naive"]["n"] == 4
    assert abs(out["naive"]["mae"] - naive_mae) < 1e-9
    assert out["naive"]["mase"] == 1.0
    # seasonal (lag 2) errors: |30-10|,|10-20|,|50-30|,|30-10|
    s_mae = (20 + 10 + 20 + 20) / 4
    assert abs(out["seasonal_naive"]["mae"] - s_mae) < 1e-9
    assert abs(
        out["seasonal_naive"]["mase"] - s_mae / naive_mae
    ) < 1e-6
    # moving_avg errs: day3 mean(10,20)=15→15, day4 mean(20,30)=25→15,
    # day5 mean(30,10)=20→30, day6 mean(10,50)=30→0
    ma_mae = (15 + 15 + 30 + 0) / 4
    assert abs(out["moving_avg"]["mae"] - ma_mae) < 1e-9
    rmse = math.sqrt((10**2 + 20**2 + 40**2 + 20**2) / 4)
    assert abs(out["naive"]["rmse"] - rmse) < 0.01


def test_ccf_detects_known_lead(spark):
    # b is exactly a shifted 2 days later → ccf at lag +2 is 1.0
    rng = np.random.default_rng(3)
    a = rng.normal(50.0, 10.0, 30)
    rows = []
    for i, v in enumerate(a):
        day = f"2024-02-{i + 1:02d}" if i < 28 else f"2024-03-{i - 27:02d}"
        rows += [(day, "x")] * int(round(v))
        if i >= 2:
            rows += [(day, "y")] * int(round(a[i - 2]))
        else:
            rows += [(day, "y")] * 5
    df = spark.createDataFrame(rows, "d string, s string").select(
        F.to_timestamp("d").alias("d"), "s"
    )
    out = {
        r["lag"]: r for r in ccf_lags(df, "d", "s", "x", "y", max_lag=3).collect()
    }
    assert set(out) == set(range(-3, 4))
    assert out[2]["ccf"] == 1.0
    assert out[2]["n_pairs"] == 28
    # and nowhere else is the correlation that perfect
    assert all(out[k]["ccf"] < 1.0 for k in out if k != 2)


def test_ccf_lag_zero_equals_pearson(spark):
    rows = []
    vals_x = [3, 5, 2, 8, 6]
    vals_y = [4, 6, 1, 9, 5]
    for i, (x, y) in enumerate(zip(vals_x, vals_y)):
        rows += [(f"2024-01-0{i + 1}", "x")] * x
        rows += [(f"2024-01-0{i + 1}", "y")] * y
    df = spark.createDataFrame(rows, "d string, s string").select(
        F.to_timestamp("d").alias("d"), "s"
    )
    out = {r["lag"]: r for r in ccf_lags(df, "d", "s", "x", "y", max_lag=1).collect()}
    expected = float(np.corrcoef(vals_x, vals_y)[0, 1])
    assert abs(out[0]["ccf"] - expected) < 1e-6


# ---------------------------------------------------------------- r7c
# seasonal_decompose / srm_check


def test_seasonal_decompose_recovers_planted_weekly_pattern(spark):
    from gbif_filter_python_spark.operators.profile import (
        seasonal_decompose,
    )

    # 4 exact weeks: constant level 100 plus a pure weekly pattern
    # that sums to zero → trend = 100 everywhere the window exists,
    # seasonal = the pattern, residual = 0.
    pattern = [21.0, -7.0, 0.0, 14.0, -14.0, -7.0, -7.0]
    rows = []
    import datetime

    start = datetime.date(2024, 1, 1)
    for i in range(28):
        d = start + datetime.timedelta(days=i)
        rows.append((d.isoformat(), 100.0 + pattern[i % 7]))
    df = spark.createDataFrame(rows, "d string, v double").select(
        F.to_timestamp("d").alias("d"), "v"
    )
    out = {r["d"].isoformat(): r for r in seasonal_decompose(df, "d", "v").collect()}
    assert len(out) == 28
    # first/last 3 days: no full centered window → null trend
    assert out["2024-01-01"]["trend"] is None
    assert out["2024-01-28"]["trend"] is None
    mid = out["2024-01-10"]
    assert mid["trend"] == 100.0
    assert abs(mid["seasonal"] - pattern[9 % 7]) < 1e-9
    assert mid["residual"] == 0.0
    # seasonal components sum to ~zero across one week
    week = [out[f"2024-01-{d:02d}"]["seasonal"] for d in range(8, 15)]
    assert abs(sum(week)) < 1e-6


def test_seasonal_decompose_rejects_even_period(spark):
    import pytest as _pytest

    from gbif_filter_python_spark.operators.profile import (
        seasonal_decompose,
    )

    df = spark.createDataFrame([("2024-01-01", 1.0)], "d string, v double")
    with _pytest.raises(ValueError):
        seasonal_decompose(df, "d", "v", period=6)


def test_srm_check_hand_chi2_and_unknown_arm(spark):
    import pytest as _pytest

    from gbif_filter_python_spark.operators.profile import srm_check

    rows = [("a",)] * 60 + [("b",)] * 40
    df = spark.createDataFrame(rows, "g string")
    out = {
        r["grp"]: r
        for r in srm_check(df, "g", {"a": 1.0, "b": 1.0}).collect()
    }
    # E = 50/50; chi2 = 100/50 + 100/50 = 4
    assert out["a"]["expected_n"] == 50.0
    assert out["a"]["contrib"] == 2.0
    assert out["a"]["chi2"] == 4.0 == out["b"]["chi2"]
    assert out["a"]["dof"] == 1 and out["a"]["n"] == 100
    # an arm in the design but absent observed still pays full E
    out3 = {
        r["grp"]: r
        for r in srm_check(df, "g", {"a": 1.0, "b": 1.0, "c": 2.0}).collect()
    }
    assert out3["c"]["n_obs"] == 0
    assert abs(out3["c"]["expected_n"] - 50.0) < 1e-9
    # an observed arm missing from the design raises
    with _pytest.raises(ValueError):
        srm_check(df, "g", {"a": 1.0})


def test_ljung_box_flags_structure_not_noise(spark):
    import datetime

    import numpy as np

    rng = np.random.default_rng(9)
    start = datetime.date(2024, 1, 1)

    def mk(vals):
        rows = [
            ((start + datetime.timedelta(days=i)).isoformat(), float(v))
            for i, v in enumerate(vals)
        ]
        return spark.createDataFrame(rows, "d string, v double").select(
            F.to_timestamp("d").alias("d"), "v"
        )

    from gbif_filter_python_spark.operators.profile import ljung_box

    noise = ljung_box(mk(rng.normal(0, 1, 120)), "d", "v", 5).collect()
    alt = ljung_box(
        mk([10.0 if i % 2 else -10.0 for i in range(120)]), "d", "v", 5
    ).collect()
    qn = {r["lag"]: r["q"] for r in noise}
    qa = {r["lag"]: r["q"] for r in alt}
    # white noise: q ~ chi2(k); alternating: r1 ~ -1 -> q huge
    assert qn[5] < 20
    assert qa[1] > 100
    ra = {r["lag"]: r["r"] for r in alt}
    assert ra[1] < -0.9 and ra[2] > 0.9


def test_ljung_box_matches_hand_formula(spark):
    import numpy as np

    from gbif_filter_python_spark.operators.profile import ljung_box

    vals = [3.0, 5.0, 2.0, 8.0, 6.0, 4.0, 7.0, 1.0]
    rows = [(f"2024-02-0{i + 1}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "d string, v double").select(
        F.to_timestamp("d").alias("d"), "v"
    )
    got = {r["lag"]: r for r in ljung_box(df, "d", "v", 2).collect()}
    x = np.array(vals)
    c = x - x.mean()
    ss = float((c * c).sum())
    n = len(x)
    r1 = float((c[:-1] * c[1:]).sum()) / ss
    r2 = float((c[:-2] * c[2:]).sum()) / ss
    assert abs(got[1]["r"] - r1) < 1e-6
    assert abs(got[2]["r"] - r2) < 1e-6
    q2 = n * (n + 2) * (r1**2 / (n - 1) + r2**2 / (n - 2))
    assert abs(got[2]["q"] - q2) < 1e-4
    assert got[2]["dof"] == 2


def test_acf_and_ccf_constant_series_yield_null_not_crash(spark):
    # ANSI corr() throws DIVIDE_BY_ZERO on zero variance; the _safe_corr
    # guard must return NULL (DuckDB semantics) instead
    rows = [(f"2024-03-{d:02d}", 5.0) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "d string, v double").select(
        F.to_timestamp("d").alias("d"), "v"
    )
    got = {r["lag"]: r["acf"] for r in acf_lags(df, "d", "v", 2).collect()}
    assert got == {1: None, 2: None}
    rows2 = [(f"2024-03-{d:02d}", "x") for d in range(1, 9)] + [
        (f"2024-03-{d:02d}", "y") for d in range(1, 9)
    ]
    df2 = spark.createDataFrame(rows2, "d string, s string").select(
        F.to_timestamp("d").alias("d"), "s"
    )
    out = {r["lag"]: r["ccf"] for r in ccf_lags(df2, "d", "s", "x", "y", max_lag=1).collect()}
    assert out[0] is None  # constant daily counts -> undefined


# ------------------------------------------------------- review fixes
# Degenerate-input regression tests: every statistic must yield NULL
# (or the documented convention), never an ANSI DIVIDE_BY_ZERO crash.


def test_anova_degenerate_designs_yield_null(spark):
    one_group = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("A", 5.0)], "g string, v double"
    )
    (r,) = anova_f(one_group, "g", "v").collect()
    assert r["f_stat"] is None and r["k_groups"] == 1
    singletons = spark.createDataFrame(
        [("A", 1.0), ("B", 2.0), ("C", 5.0)], "g string, v double"
    )
    (r2,) = anova_f(singletons, "g", "v").collect()
    assert r2["f_stat"] is None


def test_forecast_eval_both_zero_days_use_smape_convention(spark):
    rows = [(f"2024-01-0{i + 1}", v) for i, v in enumerate(
        [0.0, 0.0, 0.0, 5.0, 0.0, 0.0]
    )]
    df = spark.createDataFrame(rows, "d string, v double").select(
        F.to_timestamp("d").alias("d"), "v"
    )
    out = {r["method"]: r for r in forecast_eval(df, "d", "v", season=2).collect()}
    # day 3 actual 0, naive forecast 0 -> term 0 by convention, no crash
    assert out["naive"]["smape"] is not None


def test_t_closeness_null_quasi_class_scored_correctly(spark):
    from gbif_filter_python_spark.operators.profile import t_closeness

    rows = [("A", "s1"), ("A", "s2"), (None, "s1"), (None, "s2")]
    df = spark.createDataFrame(rows, "q string, s string")
    got = {r["q"]: r["tvd"] for r in t_closeness(df, ["q"], "s", mode="classes").collect()}
    # both classes match the global 50/50 split exactly -> tvd 0,
    # including the NULL class (was 0.5 via the equi-join bug)
    assert got == {"A": 0.0, None: 0.0}


def test_kendall_constant_column_yields_null(spark):
    from gbif_filter_python_spark.operators.profile import kendall_tau

    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (1, 3.0)], "x int, y double"
    )
    (r,) = kendall_tau(df, "x", "y").collect()
    assert r["tau_b"] is None


def test_levene_counts_null_group_like_anova(spark):
    rows = [("A", 1.0), ("A", 5.0), (None, 2.0), (None, 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    (r,) = levene_test(df, "g", "v").collect()
    assert r["n"] == 4 and r["k_groups"] == 2


def test_weighted_quantiles_hand_example_and_tie_handling(spark):
    from gbif_filter_python_spark.operators.profile import (
        weighted_quantiles,
    )

    # values 1..4 with weights 1,1,6,2 (W=10):
    # cum: 1->1, 2->2, 3->8, 4->10
    rows = [(1.0, 1.0), (2.0, 1.0), (3.0, 6.0), (4.0, 2.0)]
    df = spark.createDataFrame(rows, "v double, w double")
    got = {
        r["q"]: r["value"]
        for r in weighted_quantiles(df, "v", "w", qs=(0.1, 0.2, 0.5, 0.8, 1.0)).collect()
    }
    assert got == {0.1: 1.0, 0.2: 2.0, 0.5: 3.0, 0.8: 3.0, 1.0: 4.0}
    # duplicated values: peers must not split the selection
    rows2 = [(5.0, 3.0), (5.0, 3.0), (9.0, 4.0)]
    df2 = spark.createDataFrame(rows2, "v double, w double")
    got2 = {
        r["q"]: r["value"]
        for r in weighted_quantiles(df2, "v", "w", qs=(0.5, 0.7)).collect()
    }
    assert got2 == {0.5: 5.0, 0.7: 9.0}


def test_weighted_quantiles_excludes_nonpositive_and_guards(spark):
    import pytest as _pytest

    from gbif_filter_python_spark.operators.profile import (
        weighted_quantiles,
    )

    rows = [(1.0, 0.0), (2.0, -1.0), (3.0, 2.0)]
    df = spark.createDataFrame(rows, "v double, w double")
    got = {r["q"]: r["value"] for r in weighted_quantiles(df, "v", "w", qs=(0.5,)).collect()}
    assert got == {0.5: 3.0}  # only the positive-weight row counts
    with _pytest.raises(ValueError):
        weighted_quantiles(df, "v", "w", qs=())
    with _pytest.raises(ValueError):
        weighted_quantiles(df, "v", "w", qs=(0.0,))
