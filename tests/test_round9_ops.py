"""Round-9 operators: cluster_agreement (ARI/NMI), hubness, twonn_dim,
simpsons_slopes, neyman_allocation, fd_violations — each verified
against an exact pure-Python replay plus contract edges (degenerate
partitions, zero-variance strata, duplicate vectors, apportionment
exactness)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from gbif_filter_python_spark.operators.analytics import simpsons_slopes
from gbif_filter_python_spark.operators.corpus import neyman_allocation
from gbif_filter_python_spark.operators.fuzzy import cluster_agreement
from gbif_filter_python_spark.operators.profile import fd_violations
from gbif_filter_python_spark.operators.similarity import hubness, twonn_dim


# ---------------------------------------------------------------------------
# cluster_agreement
# ---------------------------------------------------------------------------


def _py_ari_nmi(asg):
    """Exact replay of Hubert-Arabie ARI and arithmetic NMI."""
    cells = Counter((p, t) for _, p, t in asg)
    pa = Counter()
    pb = Counter()
    for (p, t), c in cells.items():
        pa[p] += c
        pb[t] += c
    n = sum(cells.values())

    def c2(x):
        return x * (x - 1) / 2

    sc = sum(c2(c) for c in cells.values())
    sa = sum(c2(a) for a in pa.values())
    sb = sum(c2(b) for b in pb.values())
    exp = sa * sb / c2(n)
    den = (sa + sb) / 2 - exp
    ari = 1.0 if abs(den) < 1e-12 else (sc - exp) / den
    mi = sum(
        (c / n) * math.log(c * n / (pa[p] * pb[t]))
        for (p, t), c in cells.items()
    )
    hp = -sum((a / n) * math.log(a / n) for a in pa.values())
    ht = -sum((b / n) * math.log(b / n) for b in pb.values())
    hm = (hp + ht) / 2
    nmi = mi / hm if hm > 0 else 1.0
    return round(ari, 6), round(nmi, 6)


def test_cluster_agreement_matches_python_replay(spark):
    asg = [
        (i, "p%d" % (i % 4), "t%d" % ((i * 7) % 3)) for i in range(60)
    ] + [(100 + i, "px", "t0") for i in range(5)]
    df = spark.createDataFrame(
        asg, ["item", "pred_cluster", "true_cluster"]
    )
    row = cluster_agreement(df).collect()[0]
    ari, nmi = _py_ari_nmi(asg)
    assert row["n_items"] == len(asg)
    assert row["ari"] == ari
    assert row["nmi"] == nmi


def test_cluster_agreement_identical_partitions_score_one(spark):
    asg = [(i, "c%d" % (i % 3), "k%d" % (i % 3)) for i in range(30)]
    row = cluster_agreement(
        spark.createDataFrame(asg, ["item", "pred_cluster", "true_cluster"])
    ).collect()[0]
    assert row["ari"] == 1.0
    assert row["nmi"] == 1.0


def test_cluster_agreement_degenerate_single_cluster_both(spark):
    # one cluster on both sides: all-pair sets identical -> ARI 1.0 by
    # convention (denominator 0); entropies 0 -> NMI 1.0
    asg = [(i, "a", "b") for i in range(10)]
    row = cluster_agreement(
        spark.createDataFrame(asg, ["item", "pred_cluster", "true_cluster"])
    ).collect()[0]
    assert row["ari"] == 1.0
    assert row["nmi"] == 1.0


# ---------------------------------------------------------------------------
# hubness / twonn_dim
# ---------------------------------------------------------------------------


def _md5_top(ids, n):
    # the r10 fixed-count sampling contract: first n ids in
    # (md5(str(id)) ASC, id ASC) order
    import hashlib

    return sorted(
        ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:n]


def _py_hubness(vecs, k=10, sample_n=256):
    qs = {i: vecs[i] for i in _md5_top(list(vecs), sample_n)}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(y * y for y in b)
        )
        return round(num / den, 6) if den > 0 else 0.0

    occ = Counter()
    for qid, qv in qs.items():
        scored = sorted(
            ((-cos(cv, qv), cid) for cid, cv in vecs.items() if cid != qid)
        )[:k]
        for _, cid in scored:
            occ[cid] += 1
    os_ = [float(occ.get(i, 0)) for i in vecs]
    n = len(os_)
    m1 = sum(os_) / n
    m2 = sum(o * o for o in os_) / n
    m3 = sum(o**3 for o in os_) / n
    var = m2 - m1 * m1
    skew = (m3 - 3 * m1 * m2 + 2 * m1**3) / var**1.5 if var > 0 else None
    return {
        "n_queries": len(qs),
        "max": max(occ.values()) if occ else 0,
        "antihub": round(sum(o == 0 for o in os_) / n, 4),
        "skew": round(skew, 4) if skew is not None else None,
    }


def _vec(i, d=6):
    # deterministic non-degenerate vectors
    return [math.sin(0.7 * i + j) + 0.01 * j for j in range(d)]


def test_hubness_matches_python_replay(spark):
    vecs = {i: _vec(i) for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    row = hubness(df, k=5, sample_n=12).collect()[0]
    exp = _py_hubness(vecs, k=5, sample_n=12)
    assert row["n_queries"] == exp["n_queries"]
    assert row["n_corpus"] == 40
    assert row["max_k_occurrence"] == exp["max"]
    assert row["antihub_rate"] == exp["antihub"]
    assert row["skewness"] == exp["skew"]


def test_twonn_matches_python_replay(spark):
    vecs = {i: _vec(i, d=4) for i in range(50)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    anchors = {i: vecs[i] for i in _md5_top(list(vecs), 15)}
    s = 0.0
    used = 0
    for qid, qv in anchors.items():
        d2 = sorted(
            (
                sum((x - y) ** 2 for x, y in zip(cv, qv)),
                cid,
            )
            for cid, cv in vecs.items()
            if cid != qid
        )
        a, b = d2[0][0], d2[1][0]
        if a > 0:
            used += 1
            s += math.log(b / a) / 2
    row = twonn_dim(df, sample_n=15).collect()[0]
    assert row["n_anchors"] == len(anchors)
    assert row["n_used"] == used
    assert row["intrinsic_dim"] == round(used / s, 2)


def test_twonn_excludes_exact_duplicates(spark):
    # two identical vectors: each sees d1 = 0 -> excluded from the MLE
    vecs = {i: _vec(i, d=3) for i in range(20)}
    vecs[100] = list(vecs[0])
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    row = twonn_dim(df, sample_n=1000).collect()[0]
    assert row["n_anchors"] == 21
    assert row["n_used"] == 19  # ids 0 and 100 have a zero-distance NN
    assert row["intrinsic_dim"] is not None


# ---------------------------------------------------------------------------
# simpsons_slopes
# ---------------------------------------------------------------------------


def test_simpsons_flip_detected(spark):
    # classic construction: within each stratum y DECREASES with x,
    # but strata with larger x sit higher -> pooled slope positive
    rows = []
    for g, (x0, y0) in {"a": (0.0, 0.0), "b": (10.0, 30.0)}.items():
        for i in range(10):
            rows.append((g, x0 + i, y0 - i))
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in simpsons_slopes(df, "g", "x", "y").collect()}
    assert out["a"]["slope"] == -1.0 and out["b"]["slope"] == -1.0
    assert out["a"]["pooled_slope"] > 0
    assert out["a"]["flipped"] is True and out["b"]["flipped"] is True


def test_simpsons_zero_variance_stratum_is_null(spark):
    rows = [("a", 1.0, float(i)) for i in range(5)] + [
        ("b", float(i), float(2 * i)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in simpsons_slopes(df, "g", "x", "y").collect()}
    assert out["a"]["slope"] is None and out["a"]["flipped"] is None
    assert out["b"]["slope"] == 2.0


# ---------------------------------------------------------------------------
# neyman_allocation
# ---------------------------------------------------------------------------


def test_neyman_allocations_sum_to_budget_and_match_replay(spark):
    import statistics

    rows = []
    data = {
        "s1": [float(x) for x in (1, 2, 3, 4, 100)],
        "s2": [float(x) for x in (5, 5, 5, 5)],  # zero variance
        "s3": [float(x) for x in (10, 20, 30)],
    }
    for s, vs in data.items():
        rows += [(s, v) for v in vs]
    df = spark.createDataFrame(rows, ["s", "v"])
    out = {r["stratum"]: r for r in neyman_allocation(df, "s", "v", 97).collect()}
    w = {
        s: len(vs) * (statistics.stdev(vs) if len(vs) > 1 else 0.0)
        for s, vs in data.items()
    }
    tw = sum(w.values())
    reals = {s: 97 * x / tw for s, x in w.items()}
    floors = {s: math.floor(r) for s, r in reals.items()}
    leftover = 97 - sum(floors.values())
    order = sorted(
        reals, key=lambda s: (-(reals[s] - floors[s]), s)
    )
    expect = {
        s: floors[s] + (1 if w[s] > 0 and order.index(s) < leftover else 0)
        for s in reals
    }
    assert {s: out[s]["alloc"] for s in data} == expect
    assert sum(r["alloc"] for r in out.values()) == 97
    assert out["s2"]["alloc"] == 0  # zero-variance stratum needs none


def test_neyman_all_zero_weight_allocates_nothing(spark):
    rows = [("a", 1.0), ("b", 2.0)]  # both single-row -> stddev 0
    out = neyman_allocation(
        spark.createDataFrame(rows, ["s", "v"]), "s", "v", 10
    ).collect()
    assert all(r["alloc"] == 0 for r in out)


# ---------------------------------------------------------------------------
# fd_violations
# ---------------------------------------------------------------------------


def test_fd_violations_matches_python_replay(spark):
    rows = (
        [("k1", "x")] * 3
        + [("k1", "y")] * 2
        + [("k2", "x")] * 4
        + [("k3", "a"), ("k3", "b"), ("k3", "c")]
        + [(None, "z")]  # NULL LHS excluded
        + [("k4", None), ("k4", "w")]  # NULL RHS is a value
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    row = fd_violations(df, "a", "b", top_n=2).collect()[0]
    assert row["n_rows"] == 14  # 15 minus the NULL-LHS row
    assert row["n_keys"] == 4
    assert row["n_violating_keys"] == 3  # k1, k3, k4
    assert row["rows_in_violating"] == 5 + 3 + 2
    assert row["violation_row_share"] == round(10 / 14, 6)
    # g3: k1 deletes 2, k2 0, k3 2, k4 1 -> 5/14
    assert row["g3_error"] == round(5 / 14, 6)
    # top 2 by distinct-RHS desc, key desc: k3 (3), then k4/k1 tie at
    # 2 broken by key DESC -> k4
    assert row["worst_keys"] == "k3:3,k4:2"


def test_fd_violations_integer_lhs_keys_render_as_strings(spark):
    # the native-key fast path (non-float LHS groups on the native
    # value, cast to string only on the bounded keys table) must keep
    # the string rendering and string-collation tie order
    rows = [(10, "x"), (10, "y"), (9, "a"), (9, "b"), (2, "z")]
    row = fd_violations(
        spark.createDataFrame(rows, ["a", "b"]), "a", "b", top_n=2
    ).collect()[0]
    assert row["n_keys"] == 3 and row["n_violating_keys"] == 2
    # tie at n_rhs=2 broken by key DESC as STRING: "9" > "10"
    assert row["worst_keys"] == "9:2,10:2"


def test_fd_violations_double_lhs_keeps_string_grouping(spark):
    # float/double LHS must keep the string key up front: -0.0 and
    # 0.0 collapse under native grouping but render (and group) apart
    # as strings — the cast is not injective, so no fast path
    rows = [(-0.0, "x"), (0.0, "y"), (0.0, "z")]
    row = fd_violations(
        spark.createDataFrame(rows, ["a", "b"]), "a", "b"
    ).collect()[0]
    assert row["n_keys"] == 2
    assert row["n_violating_keys"] == 1  # only 0.0 -> {y, z}


def test_fd_violations_clean_dependency(spark):
    rows = [("k%d" % i, i % 3) for i in range(9)]
    row = fd_violations(
        spark.createDataFrame(rows, ["a", "b"]), "a", "b"
    ).collect()[0]
    assert row["n_violating_keys"] == 0
    assert row["g3_error"] == 0.0
    assert row["worst_keys"] == ""
