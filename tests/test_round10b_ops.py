"""Round-10 second-batch operators: kruskal_wallis, iv_2sls,
eb_shrinkage, ips_offpolicy, power_mde (analytics.py) and
budget_waterfill, kn_bigram_lm (corpus.py) — each replayed against a
hand-computed oracle on crafted inputs, plus the degenerate paths the
ANSI guards exist for."""

from __future__ import annotations

import math

import pytest

from gbif_filter_python_spark.operators.analytics import (
    eb_shrinkage,
    ips_offpolicy,
    iv_2sls,
    kruskal_wallis,
    power_mde,
)
from gbif_filter_python_spark.operators.corpus import (
    budget_waterfill,
    kn_bigram_lm,
)


# ---------------------------------------------------------------------------
# kruskal_wallis
# ---------------------------------------------------------------------------


def test_kruskal_wallis_hand_computed_with_ties(spark):
    # a: 1,2,3  b: 2,3,4 — ranks 1, 2.5, 2.5, 4.5, 4.5, 6
    # R_a = 8, R_b = 13; H = 12/42·(64/3 + 169/3) − 21 = 1.190476
    # ties: two pairs → C = 1 − 12/210; H/C = 1.262626
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 3.0), ("b", 4.0)],
        ["g", "v"],
    )
    row = kruskal_wallis(df, "g", "v").collect()[0]
    assert (row["n"], row["k_groups"], row["dof"]) == (6, 2, 1)
    assert row["h_stat"] == round(12 / 42 * (64 / 3 + 169 / 3) - 21, 6)
    assert row["h_corrected"] == pytest.approx(
        row["h_stat"] / (1 - 12 / 210), abs=1e-6
    )


def test_kruskal_wallis_all_tied_yields_null_correction(spark):
    # every observation shares one value → correction factor 0 →
    # h_corrected NULL, h_stat exactly 0
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)], ["g", "v"]
    )
    row = kruskal_wallis(df, "g", "v").collect()[0]
    assert row["h_stat"] == 0.0
    assert row["h_corrected"] is None


def test_kruskal_wallis_epsilon_null_when_n_equals_k(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], ["g", "v"])
    row = kruskal_wallis(df, "g", "v").collect()[0]
    assert row["epsilon_sq"] is None


# ---------------------------------------------------------------------------
# iv_2sls
# ---------------------------------------------------------------------------


def test_iv_2sls_recovers_exact_slope_when_z_is_x(spark):
    df = spark.createDataFrame(
        [(2.0 * x, float(x), float(x)) for x in range(1, 8)],
        ["y", "x", "z"],
    )
    row = iv_2sls(df, "y", "x", "z").collect()[0]
    assert row["beta_ols"] == 2.0
    assert row["first_stage_slope"] == 1.0
    assert row["beta_iv"] == 2.0


def test_iv_2sls_matches_numpy_covariances(spark):
    import numpy as np

    z = np.arange(1.0, 9.0)
    # confounder chosen EXACTLY orthogonal to z (Σzu = 0, Σu = 0),
    # so cov(z,y) = 3·cov(z,x) and the IV estimate is exactly 3
    u = np.array([1.0, 1.0, -1.0, -1.0, -1.0, -1.0, 1.0, 1.0])
    x = z + u
    y = 3.0 * x + 5.0 * u
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(y, x, z)],
        ["y", "x", "z"],
    )
    row = iv_2sls(df, "y", "x", "z").collect()[0]
    n = len(z)
    beta_iv = (n * (z * y).sum() - z.sum() * y.sum()) / (
        n * (z * x).sum() - z.sum() * x.sum()
    )
    beta_ols = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    assert row["beta_iv"] == pytest.approx(beta_iv, abs=1e-6)
    assert row["beta_ols"] == pytest.approx(beta_ols, abs=1e-6)
    # the instrument strips the confounder: IV lands on 3, OLS doesn't
    assert row["beta_iv"] == 3.0
    assert abs(row["beta_ols"] - 3.0) > 0.5


def test_iv_2sls_null_on_zero_variance_instrument(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0, 7.0), (2.0, 2.0, 7.0), (3.0, 4.0, 7.0)],
        ["y", "x", "z"],
    )
    row = iv_2sls(df, "y", "x", "z").collect()[0]
    assert row["first_stage_slope"] is None
    assert row["beta_iv"] is None
    assert row["beta_ols"] is not None


# ---------------------------------------------------------------------------
# eb_shrinkage
# ---------------------------------------------------------------------------


def _mom_shrink(groups):
    """Independent NumPy replay of the method-of-moments formulas."""
    import numpy as np

    ns = np.array([len(g) for g in groups], dtype=float)
    means = np.array([np.mean(g) for g in groups])
    big_n, k = ns.sum(), float(len(groups))
    grand = sum(np.sum(g) for g in groups) / big_n
    ssw = sum(((np.array(g) - m) ** 2).sum() for g, m in zip(groups, means))
    s2 = ssw / (big_n - k) if big_n > k else 0.0
    ssb = (ns * (means - grand) ** 2).sum()
    den = big_n - (ns**2).sum() / big_n
    tau2 = max(0.0, (ssb - (k - 1) * s2) / den) if den > 0 else 0.0
    lam = [
        tau2 / (tau2 + s2 / n) if tau2 + s2 / n > 0 else 0.0 for n in ns
    ]
    return grand, [
        grand + lm * (m - grand) for lm, m in zip(lam, means)
    ], lam


def test_eb_shrinkage_matches_numpy_mom(spark):
    groups = {
        "a": [10.0, 12.0, 11.0, 13.0],
        "b": [30.0, 31.0],
        "c": [20.0, 18.0, 22.0, 20.0, 20.0],
    }
    df = spark.createDataFrame(
        [(g, v) for g, vs in groups.items() for v in vs], ["g", "v"]
    )
    rows = {r["g"]: r for r in eb_shrinkage(df, "g", "v").collect()}
    grand, shrunk, lam = _mom_shrink(list(groups.values()))
    for (name, _), s, lm in zip(groups.items(), shrunk, lam):
        assert rows[name]["shrunk_mean"] == pytest.approx(s, abs=1e-6)
        assert rows[name]["shrink_weight"] == pytest.approx(lm, abs=1e-6)
    # shrinkage pulls small groups harder toward the grand mean
    assert rows["b"]["shrink_weight"] <= rows["c"]["shrink_weight"]
    for name, vs in groups.items():
        raw = sum(vs) / len(vs)
        assert (
            abs(rows[name]["shrunk_mean"] - grand)
            <= abs(raw - grand) + 1e-9
        )


def test_eb_shrinkage_degenerate_constant_data_full_shrink(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0)], ["g", "v"]
    )
    rows = eb_shrinkage(df, "g", "v").collect()
    for r in rows:
        assert r["shrink_weight"] == 0.0
        assert r["shrunk_mean"] == 5.0


# ---------------------------------------------------------------------------
# ips_offpolicy
# ---------------------------------------------------------------------------


def test_ips_offpolicy_hand_computed(spark):
    # two actions; k = 2; weights (1/2)/p
    rows = [
        ("a", 10.0, 0.5),
        ("a", 20.0, 0.5),
        ("b", 30.0, 0.25),
    ]
    df = spark.createDataFrame(rows, ["act", "r", "p"])
    out = ips_offpolicy(df, "act", "r", "p").collect()[0]
    w = [0.5 / 0.5, 0.5 / 0.5, 0.5 / 0.25]
    r = [10.0, 20.0, 30.0]
    n = 3
    ips = sum(wi * ri for wi, ri in zip(w, r)) / n
    snips = sum(wi * ri for wi, ri in zip(w, r)) / sum(w)
    ess = sum(w) ** 2 / sum(wi * wi for wi in w)
    assert (out["n"], out["k_actions"]) == (3, 2)
    assert out["ips"] == pytest.approx(ips, abs=1e-6)
    assert out["snips"] == pytest.approx(snips, abs=1e-6)
    assert out["ess"] == pytest.approx(ess, abs=1e-6)
    assert out["mean_logged_reward"] == 20.0


def test_ips_offpolicy_snips_equals_ips_under_true_propensities(spark):
    # with EXACT empirical propensities Σw = n, so SNIPS ≡ IPS — the
    # self-normalization only bites when the logger is miscalibrated
    rows = [("a", 1.0), ("a", 3.0), ("a", 5.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, ["act", "r"])
    from pyspark.sql import functions as F

    df = df.withColumn(
        "p", F.when(F.col("act") == "a", 0.75).otherwise(0.25)
    )
    out = ips_offpolicy(df, "act", "r", "p").collect()[0]
    assert out["snips"] == out["ips"]
    assert out["ess"] <= out["n"]


def test_ips_offpolicy_drops_nonpositive_propensity(spark):
    rows = [("a", 1.0, 0.5), ("b", 2.0, 0.0), ("b", 3.0, None)]
    df = spark.createDataFrame(rows, ["act", "r", "p"])
    out = ips_offpolicy(df, "act", "r", "p").collect()[0]
    assert out["n"] == 1
    assert out["k_actions"] == 1


# ---------------------------------------------------------------------------
# power_mde
# ---------------------------------------------------------------------------


def test_power_mde_hand_computed(spark):
    df = spark.createDataFrame(
        [("g", 10.0), ("g", 12.0), ("one", 4.0)], ["g", "v"]
    )
    rows = {r["g"]: r for r in power_mde(df, "g", "v").collect()}
    sd = math.sqrt(2.0)
    mde = (1.9599639845400545 + 0.8416212335729143) * sd * math.sqrt(1.0)
    assert rows["g"]["sd"] == pytest.approx(sd, abs=1e-6)
    assert rows["g"]["mde_abs"] == pytest.approx(mde, abs=1e-6)
    assert rows["g"]["mde_rel"] == pytest.approx(mde / 11.0, abs=1e-6)
    # n = 1: no variance estimate, no MDE — NULL, never an error
    assert rows["one"]["sd"] is None
    assert rows["one"]["mde_abs"] is None


def test_power_mde_rel_null_for_nonpositive_mean(spark):
    df = spark.createDataFrame([("g", -1.0), ("g", 1.0)], ["g", "v"])
    row = power_mde(df, "g", "v").collect()[0]
    assert row["mean"] == 0.0
    assert row["mde_abs"] is not None
    assert row["mde_rel"] is None


# ---------------------------------------------------------------------------
# budget_waterfill
# ---------------------------------------------------------------------------


def _wf(spark, rows):
    return spark.createDataFrame(rows, ["source", "n_chars"])


def test_budget_waterfill_uncapped_regime_exact_lambda(spark):
    # equal saturation ratios → λ = B/W uncapped everywhere;
    # per-domain rows also prove the token sum aggregates first
    rows = [("A", 60), ("A", 40), ("B", 100), ("C", 800)]
    out = {
        r["domain"]: r
        for r in budget_waterfill(
            _wf(spark, rows),
            budget_epochs=1.5,
            max_epochs=2.0,
            temperature=1.0,
        ).collect()
    }
    assert out["A"]["tokens"] == 100
    for d, alloc in [("A", 150.0), ("B", 150.0), ("C", 1200.0)]:
        assert out[d]["alloc_tokens"] == alloc
        assert out[d]["epochs"] == 1.5


def test_budget_waterfill_mixed_regime_caps_then_fills(spark):
    # temperature 0 → equal weights; caps 200,200,1600; B = 1200:
    # A and B saturate at λ=200, C takes the remaining 800
    rows = [("A", 100), ("B", 100), ("C", 800)]
    out = {
        r["domain"]: r
        for r in budget_waterfill(
            _wf(spark, rows),
            budget_epochs=1.2,
            max_epochs=2.0,
            temperature=0.0,
        ).collect()
    }
    assert out["A"]["alloc_tokens"] == 200.0
    assert out["B"]["alloc_tokens"] == 200.0
    assert out["C"]["alloc_tokens"] == 800.0
    assert out["A"]["epochs"] == 2.0
    assert out["C"]["epochs"] == 1.0
    total = sum(r["alloc_tokens"] for r in out.values())
    assert total == pytest.approx(1200.0, abs=1e-6)


def test_budget_waterfill_budget_exceeds_caps_all_capped(spark):
    rows = [("A", 100), ("B", 300)]
    out = {
        r["domain"]: r
        for r in budget_waterfill(
            _wf(spark, rows),
            budget_epochs=5.0,
            max_epochs=2.0,
            temperature=1.0,
        ).collect()
    }
    for d in ("A", "B"):
        assert out[d]["epochs"] == 2.0
        assert out[d]["alloc_tokens"] == out[d]["cap_tokens"]


def test_budget_waterfill_invariants_on_real_shape(spark):
    rows = [(f"s{i}", 100 + 37 * i) for i in range(8) for _ in range(3)]
    res = budget_waterfill(
        _wf(spark, rows), budget_epochs=3.0, max_epochs=4.0
    ).collect()
    total_t = sum(r["tokens"] for r in res)
    total_alloc = sum(r["alloc_tokens"] for r in res)
    assert total_alloc == pytest.approx(3.0 * total_t, rel=1e-6)
    for r in res:
        assert 0.0 < r["epochs"] <= 4.0 + 1e-9
        assert r["alloc_tokens"] <= r["cap_tokens"] + 1e-9
    assert sum(r["weight"] for r in res) == pytest.approx(1.0, abs=1e-5)


def test_budget_waterfill_rejects_bad_params(spark):
    df = _wf(spark, [("A", 10)])
    with pytest.raises(ValueError):
        budget_waterfill(df, budget_epochs=0.0)
    with pytest.raises(ValueError):
        budget_waterfill(df, max_epochs=-1.0)


# ---------------------------------------------------------------------------
# kn_bigram_lm
# ---------------------------------------------------------------------------


def test_kn_bigram_lm_hand_computed(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "b c")], ["doc_id", "text"]
    )
    rows = kn_bigram_lm(docs, top_n=10).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in rows}
    # counts: (a,b)=2, (b,c)=2, (b,a)=1; ranks tie-broken w1 asc
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert (rows[0]["w1"], rows[0]["w2"]) == ("a", "b")
    assert (rows[1]["w1"], rows[1]["w2"]) == ("b", "c")
    # c1(a)=2 ft(a)=1; c1(b)=3 ft(b)=2; pcont = prec_types/3
    assert by_pair[("a", "b")]["p_kn"] == pytest.approx(
        (2 - 0.75) / 2 + (0.75 * 1 / 2) * (1 / 3), abs=1e-6
    )
    assert by_pair[("b", "c")]["p_kn"] == pytest.approx(
        (2 - 0.75) / 3 + (0.75 * 2 / 3) * (1 / 3), abs=1e-6
    )
    assert by_pair[("b", "a")]["p_kn"] == pytest.approx(
        (1 - 0.75) / 3 + (0.75 * 2 / 3) * (1 / 3), abs=1e-6
    )
    assert by_pair[("a", "b")]["p_mle"] == 1.0
    assert by_pair[("b", "a")]["backoff_mass"] == pytest.approx(
        0.75 * 2 / 3, abs=1e-6
    )


def test_kn_bigram_lm_context_mass_sums_to_one(spark):
    # Σ_w2∈vocab p_kn(w2|w1) = 1: observed continuations + the backoff
    # mass spread over unseen vocab words (Chen & Goodman eq. 4.26)
    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "b c a")], ["doc_id", "text"]
    )
    rows = kn_bigram_lm(docs, top_n=100).collect()
    vocab_pcont = {}
    n_types = len(rows)
    for r in rows:
        vocab_pcont.setdefault(r["w2"], set()).add(r["w1"])
    pcont = {w: len(s) / n_types for w, s in vocab_pcont.items()}
    vocab = set(pcont) | {r["w1"] for r in rows}
    for w1 in {r["w1"] for r in rows}:
        seen = [r for r in rows if r["w1"] == w1]
        backoff = seen[0]["backoff_mass"]
        mass = sum(r["p_kn"] for r in seen)
        unseen = vocab - {r["w2"] for r in seen}
        mass += sum(backoff * pcont.get(w, 0.0) for w in unseen)
        assert mass == pytest.approx(1.0, abs=1e-4)


def test_kn_bigram_lm_validates_discount_and_empty(spark):
    docs = spark.createDataFrame([(0, "only")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        kn_bigram_lm(docs, discount=1.5)
    # single-word docs yield no bigrams — empty result, no error
    assert kn_bigram_lm(docs).count() == 0
