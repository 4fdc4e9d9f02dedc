"""Round-11 fourth batch: matched-block / k-sample rank statistics
(friedman_test, mood_median_test, cochran_q) and centroid-level
cluster-quality datasheets (davies_bouldin, simplified_silhouette).
Hand-computed textbook cases + degeneracy contracts."""

from __future__ import annotations

import math

import pytest

from gbif_filter_python_spark.operators.analytics import cochran_q
from gbif_filter_python_spark.operators.profile import (
    friedman_test,
    mood_median_test,
)
from gbif_filter_python_spark.operators.similarity import (
    davies_bouldin,
    simplified_silhouette,
)


# ---------------------------------------------------------------------------
# friedman_test
# ---------------------------------------------------------------------------


def _blocks(spark, data):
    rows = [
        (b, f"t{j}", float(v))
        for b, vals in data.items()
        for j, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, ["blk", "trt", "v"])


def test_friedman_untied_matches_classic_formula(spark):
    data = {
        "b1": (1, 2, 3),
        "b2": (1, 3, 2),
        "b3": (1, 2, 3),
        "b4": (2, 1, 3),
    }
    r = friedman_test(_blocks(spark, data), "blk", "trt", "v").collect()[0]
    # rank sums 5, 8, 11 -> 12/(4*3*4)*(25+64+121) - 3*4*4 = 4.5
    assert r["k_treatments"] == 3 and r["n_blocks"] == 4
    assert r["n_blocks_dropped"] == 0
    assert r["friedman_stat"] == pytest.approx(4.5, abs=1e-6)


def test_friedman_ties_use_average_ranks(spark):
    data = {"b1": (1, 1, 2), "b2": (3, 1, 2), "b3": (1, 2, 3)}
    r = friedman_test(_blocks(spark, data), "blk", "trt", "v").collect()[0]
    # b1 ranks: 1.5, 1.5, 3 — tie-corrected denominator shrinks
    # hand: R = (1.5+3+1, 1.5+1+2, 3+2+3) = (5.5, 4.5, 8)
    # S = sum (Rj - 6)^2 = .25 + 2.25 + 4 = 6.5
    # D = sum r^2 - n k (k+1)^2/4 = (2.25+2.25+9)+(9+1+4)+(1+4+9) - 3*3*4
    #   = 41.5 - 36 = 5.5 ;  stat = 2*6.5/5.5
    assert r["friedman_stat"] == pytest.approx(2 * 6.5 / 5.5, abs=1e-6)


def test_friedman_drops_incomplete_blocks(spark):
    rows = [
        ("b1", "t0", 1.0), ("b1", "t1", 2.0),
        ("b2", "t0", 2.0), ("b2", "t1", 1.0),
        ("b3", "t0", 5.0),  # missing t1 -> dropped
    ]
    df = spark.createDataFrame(rows, ["blk", "trt", "v"])
    r = friedman_test(df, "blk", "trt", "v").collect()[0]
    assert r["n_blocks"] == 2 and r["n_blocks_dropped"] == 1


def test_friedman_all_tied_null(spark):
    data = {"b1": (1, 1, 1), "b2": (2, 2, 2)}
    r = friedman_test(_blocks(spark, data), "blk", "trt", "v").collect()[0]
    assert r["friedman_stat"] is None


# ---------------------------------------------------------------------------
# mood_median_test
# ---------------------------------------------------------------------------


def test_mood_separated_groups(spark):
    rows = [("a", float(v)) for v in range(1, 6)] + [
        ("b", float(v)) for v in range(6, 11)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["grp"]: r for r in mood_median_test(df, "g", "v").collect()}
    assert out["a"]["n_above"] == 0 and out["b"]["n_above"] == 5
    assert out["a"]["expected_above"] == pytest.approx(2.5)
    assert out["a"]["chi2_stat"] == pytest.approx(10.0, abs=1e-6)


def test_mood_excludes_median_ties(spark):
    rows = [("a", 1.0), ("a", 5.0), ("b", 5.0), ("b", 9.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["grp"]: r for r in mood_median_test(df, "g", "v").collect()}
    # median = 5; the three 5s drop out
    assert out["a"]["n_above"] + out["a"]["n_below"] == 1
    assert out["b"]["n_above"] + out["b"]["n_below"] == 1


# ---------------------------------------------------------------------------
# cochran_q
# ---------------------------------------------------------------------------


def test_cochran_q_hand_computed(spark):
    data = [
        (1, 1, 0), (1, 1, 0), (1, 1, 1), (1, 1, 0), (1, 0, 0),
        (1, 1, 1), (1, 1, 0), (1, 1, 0), (0, 0, 1), (1, 1, 0),
        (1, 1, 1), (1, 1, 1),
    ]
    df = spark.createDataFrame(data, ["a", "b", "c"])
    r = cochran_q(df, ["a", "b", "c"]).collect()[0]
    assert (r["successes_0"], r["successes_1"], r["successes_2"]) == (
        11, 10, 5,
    )
    assert r["q_stat"] == pytest.approx(7.75, abs=1e-6)


def test_cochran_q_unanimous_rows_null(spark):
    df = spark.createDataFrame(
        [(1, 1, 1), (0, 0, 0)], ["a", "b", "c"]
    )
    r = cochran_q(df, ["a", "b", "c"]).collect()[0]
    assert r["q_stat"] is None  # denominator 0


def test_cochran_q_requires_two_columns(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    with pytest.raises(ValueError):
        cochran_q(df, ["a"])


# ---------------------------------------------------------------------------
# davies_bouldin / simplified_silhouette
# ---------------------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, (v, lab) in enumerate(rows)],
        ["vec_id", "embedding", "label"],
    )


def test_db_hand_computed_two_clusters(spark):
    rows = [
        ([0.0, 0.0], 0), ([0.0, 2.0], 0),
        ([10.0, 0.0], 1), ([10.0, 2.0], 1),
    ]
    out = {r["label"]: r for r in davies_bouldin(_emb(spark, rows)).collect()}
    # centroids (0,1) / (10,1), S = 1 each, centroid dist 10
    assert out[0]["dispersion"] == pytest.approx(1.0)
    assert out[0]["worst_ratio"] == pytest.approx(0.2)
    assert out[0]["db_index"] == pytest.approx(0.2)


def test_db_overlapping_clusters_score_worse(spark):
    tight = [([0.0, 0.0], 0), ([0.0, 1.0], 0), ([20.0, 0.0], 1),
             ([20.0, 1.0], 1)]
    loose = [([0.0, 0.0], 0), ([0.0, 9.0], 0), ([2.0, 0.0], 1),
             ([2.0, 9.0], 1)]
    dbt = davies_bouldin(_emb(spark, tight)).collect()[0]["db_index"]
    dbl = davies_bouldin(_emb(spark, loose)).collect()[0]["db_index"]
    assert dbt < dbl


def test_db_single_label_null_ratio(spark):
    out = davies_bouldin(
        _emb(spark, [([1.0, 0.0], 0), ([2.0, 0.0], 0)])
    ).collect()
    assert out[0]["worst_ratio"] is None


def test_silhouette_hand_computed(spark):
    rows = [
        ([0.0, 0.0], 0), ([0.0, 2.0], 0),
        ([10.0, 0.0], 1), ([10.0, 2.0], 1),
    ]
    out = {
        r["label"]: r
        for r in simplified_silhouette(_emb(spark, rows)).collect()
    }
    # a = 1, b = sqrt(101) -> s = (sqrt(101)-1)/sqrt(101)
    exp = (math.sqrt(101) - 1) / math.sqrt(101)
    assert out[0]["mean_silhouette"] == pytest.approx(exp, abs=1e-5)
    assert out[0]["n_points"] == 2


def test_silhouette_single_label_null(spark):
    out = simplified_silhouette(
        _emb(spark, [([1.0, 0.0], 0), ([2.0, 0.0], 0)])
    ).collect()
    assert out[0]["mean_silhouette"] is None


def test_silhouette_identical_centroids_zero(spark):
    # both labels share the same centroid -> a == b -> s = 0
    rows = [
        ([0.0, 0.0], 0), ([2.0, 2.0], 0),
        ([2.0, 0.0], 1), ([0.0, 2.0], 1),
    ]
    out = simplified_silhouette(_emb(spark, rows)).collect()
    for r in out:
        assert r["mean_silhouette"] == pytest.approx(0.0, abs=1e-6)
