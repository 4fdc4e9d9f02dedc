"""Round-10 third-batch operators: msprt_test, funnel_ab_test
(analytics.py), capture_recapture (profile.py), burstiness, domain_kl
(corpus.py) — hand-computed oracles plus degenerate-input guards."""

from __future__ import annotations

import math

import pytest

from gbif_filter_python_spark.operators.analytics import (
    funnel_ab_test,
    msprt_test,
)
from gbif_filter_python_spark.operators.corpus import burstiness, domain_kl
from gbif_filter_python_spark.operators.profile import capture_recapture


# ---------------------------------------------------------------------------
# msprt_test
# ---------------------------------------------------------------------------


def _msprt_hand(a_vals, b_vals, tau2):
    na, nb = len(a_vals), len(b_vals)
    ma = sum(a_vals) / na
    mb = sum(b_vals) / nb
    va = sum((x - ma) ** 2 for x in a_vals) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b_vals) / (nb - 1)
    se2 = va / na + vb / nb
    delta = mb - ma
    lam = math.sqrt(se2 / (se2 + tau2)) * math.exp(
        delta * delta * tau2 / (2.0 * se2 * (se2 + tau2))
    )
    return delta, math.sqrt(se2), lam, min(1.0, 1.0 / lam)


def test_msprt_hand_computed(spark):
    a = [10.0, 12.0, 11.0, 13.0]
    b = [14.0, 16.0, 15.0, 17.0]
    df = spark.createDataFrame(
        [("c", v) for v in a] + [("t", v) for v in b], ["arm", "v"]
    )
    row = msprt_test(df, "arm", "v", "c", "t", tau2=4.0).collect()[0]
    delta, se, lam, p = _msprt_hand(a, b, 4.0)
    assert (row["n_control"], row["n_treatment"]) == (4, 4)
    assert row["delta"] == pytest.approx(delta, abs=1e-6)
    assert row["se"] == pytest.approx(se, abs=1e-6)
    assert row["lam"] == pytest.approx(lam, abs=1e-4)
    assert row["p_always_valid"] == pytest.approx(p, abs=1e-6)
    # a 4-sd shift on tight arms should reject
    assert row["reject_h0"] is True


def test_msprt_null_effect_does_not_reject(spark):
    rows = [("c", float(v)) for v in range(20)] + [
        ("t", float(v)) for v in range(20)
    ]
    df = spark.createDataFrame(rows, ["arm", "v"])
    row = msprt_test(df, "arm", "v", "c", "t", tau2=10.0).collect()[0]
    assert row["delta"] == 0.0
    assert row["p_always_valid"] == 1.0
    assert row["reject_h0"] is False


def test_msprt_degenerate_single_row_arm_yields_nulls(spark):
    df = spark.createDataFrame(
        [("c", 1.0), ("t", 2.0), ("t", 3.0)], ["arm", "v"]
    )
    row = msprt_test(df, "arm", "v", "c", "t").collect()[0]
    assert row["n_control"] == 1
    assert row["lam"] is None
    assert row["p_always_valid"] is None
    assert row["reject_h0"] is None


def test_msprt_rejects_bad_tau(spark):
    df = spark.createDataFrame([("c", 1.0)], ["arm", "v"])
    with pytest.raises(ValueError):
        msprt_test(df, "arm", "v", "c", "t", tau2=0.0)


# ---------------------------------------------------------------------------
# funnel_ab_test
# ---------------------------------------------------------------------------


def test_funnel_ab_hand_computed(spark):
    # arm 0: 4 users view, 2 click; arm 1: 4 users view, 1 clicks.
    rows = []
    for u in range(4):
        rows.append((u * 2, 0, "view"))
        rows.append((u * 2 + 1, 1, "view"))
    rows += [(0, 0, "click"), (2, 0, "click"), (1, 1, "click")]
    # duplicate events must not double-count reach
    rows += [(0, 0, "view"), (0, 0, "click")]
    df = spark.createDataFrame(rows, ["user_id", "arm", "event_type"])
    out = {
        r["stage_idx"]: r
        for r in funnel_ab_test(
            df, ["view", "click"], "arm"
        ).collect()
    }
    top = out[0]
    assert (top["users_a"], top["users_b"]) == (4, 4)
    assert top["conv_a"] is None and top["z"] is None
    step = out[1]
    assert (step["users_a"], step["users_b"]) == (2, 1)
    assert step["conv_a"] == 0.5 and step["conv_b"] == 0.25
    pooled = 3 / 8
    zden = math.sqrt(pooled * (1 - pooled) * (1 / 4 + 1 / 4))
    assert step["z"] == pytest.approx((0.5 - 0.25) / zden, abs=1e-6)
    assert step["significant_05"] is False


def test_funnel_ab_missing_arm_stage_densifies_to_zero(spark):
    # arm 1 never reaches click: the densified reach grid counts it
    # as 0 of 1 (conv_b = 0.0 against the immediately preceding
    # stage's reach), not NULL — and z stays computable, no crash
    rows = [(0, 0, "view"), (1, 1, "view"), (0, 0, "click")]
    df = spark.createDataFrame(rows, ["user_id", "arm", "event_type"])
    out = {
        r["stage_idx"]: r
        for r in funnel_ab_test(df, ["view", "click"], "arm").collect()
    }
    assert out[1]["users_b"] == 0
    assert out[1]["conv_a"] == 1.0
    assert out[1]["conv_b"] == 0.0
    pooled = 1 / 2
    zden = math.sqrt(pooled * (1 - pooled) * (1 / 1 + 1 / 1))
    assert out[1]["z"] == pytest.approx((1.0 - 0.0) / zden, abs=1e-6)


def test_funnel_ab_stage_absent_in_both_arms_still_emits_row(spark):
    # nobody clicks at all: the click row exists with zero reach and
    # zero conversions; the downstream signup row converts against
    # click's (zero) reach -> NULL conversions, never a crash
    rows = [(0, 0, "view"), (1, 1, "view"), (0, 0, "signup")]
    df = spark.createDataFrame(rows, ["user_id", "arm", "event_type"])
    out = {
        r["stage_idx"]: r
        for r in funnel_ab_test(
            df, ["view", "click", "signup"], "arm"
        ).collect()
    }
    assert set(out) == {0, 1, 2}
    assert (out[1]["users_a"], out[1]["users_b"]) == (0, 0)
    assert out[1]["conv_a"] == 0.0 and out[1]["conv_b"] == 0.0
    assert out[2]["conv_a"] is None and out[2]["z"] is None


def test_funnel_ab_requires_two_stages(spark):
    df = spark.createDataFrame([(0, 0, "view")], ["user_id", "arm", "event_type"])
    with pytest.raises(ValueError):
        funnel_ab_test(df, ["view"], "arm")


# ---------------------------------------------------------------------------
# capture_recapture
# ---------------------------------------------------------------------------


def test_capture_recapture_hand_computed(spark):
    # users: 1 in both surveys, 2 only in s0, 3 only in s1, 4 unseen
    # by either survey (NULL survey rows) but still a real identity
    rows = [
        (1, 0),
        (1, 1),
        (2, 0),
        (3, 1),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["uid", "survey"])
    row = capture_recapture(df, "uid", "survey").collect()[0]
    assert (row["n_survey1"], row["n_survey2"], row["overlap"]) == (
        2,
        2,
        1,
    )
    est = (2 + 1) * (2 + 1) / (1 + 1) - 1  # 3.5
    assert row["chapman_est"] == est
    assert row["true_distinct"] == 4
    assert row["rel_err"] == pytest.approx((est - 4) / 4, abs=1e-4)


def test_capture_recapture_zero_overlap_stays_finite(spark):
    rows = [(1, 0), (2, 1)]
    df = spark.createDataFrame(rows, ["uid", "survey"])
    row = capture_recapture(df, "uid", "survey").collect()[0]
    assert row["overlap"] == 0
    assert row["chapman_est"] == 3.0  # (1+1)(1+1)/1 - 1


def test_capture_recapture_unbiased_on_independent_split(spark):
    # each of 500 users observed once per survey -> overlap = all,
    # estimate exactly equals the truth
    rows = [(u, s) for u in range(500) for s in (0, 1)]
    df = spark.createDataFrame(rows, ["uid", "survey"])
    row = capture_recapture(df, "uid", "survey").collect()[0]
    assert row["chapman_est"] == pytest.approx(500.0, abs=0.01)
    assert row["rel_err"] == pytest.approx(0.0, abs=1e-4)


# ---------------------------------------------------------------------------
# burstiness
# ---------------------------------------------------------------------------


def test_burstiness_bursty_beats_uniform(spark):
    # "spam" appears 8x in ONE doc of 8; "the" once in EVERY doc.
    # mean is 1 for both; E[x2]: spam 64/8=8, the 1 -> VMR 7 vs 0.
    texts = ["spam " * 8] + ["the x"] * 7
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = burstiness(docs, min_docs=1, top_n=10).collect()
    by_term = {r["term"]: r for r in rows}
    n = 8.0
    spam_vmr = (64 / n - (8 / n) ** 2) / (8 / n)
    the_vmr = (7 / n - (7 / n) ** 2) / (7 / n)
    assert by_term["spam"]["vmr"] == pytest.approx(spam_vmr, abs=1e-6)
    assert by_term["the"]["vmr"] == pytest.approx(the_vmr, abs=1e-6)
    assert rows[0]["term"] == "spam"  # highest VMR ranks first
    assert by_term["spam"]["df_docs"] == 1
    assert by_term["spam"]["total_count"] == 8


def test_burstiness_min_docs_filters_rare_terms(spark):
    texts = ["rare rare rare", "common a", "common b", "common c"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    terms = {
        r["term"] for r in burstiness(docs, min_docs=3, top_n=10).collect()
    }
    assert "rare" not in terms
    assert "common" in terms


# ---------------------------------------------------------------------------
# domain_kl
# ---------------------------------------------------------------------------


def _kl_hand(dom_counts, corpus_counts, alpha):
    """Naive full-vocabulary KL — the O(domains x V) form the operator
    avoids; must agree with the closed-form decomposition exactly."""
    vocab = list(corpus_counts)
    V = len(vocab)
    T = sum(corpus_counts.values())
    Td = sum(dom_counts.values())
    kl = 0.0
    for w in vocab:
        p = (dom_counts.get(w, 0) + alpha) / (Td + alpha * V)
        q = (corpus_counts[w] + alpha) / (T + alpha * V)
        kl += p * math.log(p / q)
    return kl


def test_domain_kl_matches_naive_full_vocab_sum(spark):
    docs = spark.createDataFrame(
        [
            (0, "a", "x x y z"),
            (1, "a", "x y"),
            (2, "b", "z z z w"),
            (3, "b", "w w"),
        ],
        ["doc_id", "source", "text"],
    )
    rows = {r["domain"]: r for r in domain_kl(docs).collect()}
    corpus = {"x": 3, "y": 2, "z": 4, "w": 3}
    dom_a = {"x": 3, "y": 2, "z": 1}
    dom_b = {"z": 3, "w": 3}
    assert rows["a"]["kl_nats"] == pytest.approx(
        _kl_hand(dom_a, corpus, 0.5), abs=1e-6
    )
    assert rows["b"]["kl_nats"] == pytest.approx(
        _kl_hand(dom_b, corpus, 0.5), abs=1e-6
    )
    assert rows["a"]["terms_seen"] == 3
    assert rows["a"]["coverage"] == 0.75
    assert rows["b"]["tokens"] == 6


def test_domain_kl_identical_domain_near_zero(spark):
    docs = spark.createDataFrame(
        [(0, "a", "p q r"), (1, "b", "p q r")],
        ["doc_id", "source", "text"],
    )
    rows = {r["domain"]: r for r in domain_kl(docs).collect()}
    # both domains ARE the corpus distribution -> KL ~ 0
    for r in rows.values():
        assert abs(r["kl_nats"]) < 1e-4
        assert r["coverage"] == 1.0


def test_domain_kl_rejects_bad_alpha(spark):
    docs = spark.createDataFrame([(0, "a", "x")], ["doc_id", "source", "text"])
    with pytest.raises(ValueError):
        domain_kl(docs, alpha=0.0)
