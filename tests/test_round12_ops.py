"""Round-12 operator additions: categorical drift (chi-square + PSI)
folded into drift_report's single stacked scan, hand-computed against
the textbook formulas (the closed forms in the implementation are
algebraic rearrangements — these tests pin the equivalence)."""

from __future__ import annotations

import math

import pytest

from gbif_filter_python_spark.operators.profile import drift_report


def _chi2_2xk(ca: dict, cb: dict) -> float:
    """Textbook sum (o-e)^2/e over the 2 x k contingency table."""
    levels = sorted(set(ca) | set(cb))
    na, nb = sum(ca.values()), sum(cb.values())
    n = na + nb
    out = 0.0
    for l in levels:
        t = ca.get(l, 0) + cb.get(l, 0)
        for o, row in ((ca.get(l, 0), na), (cb.get(l, 0), nb)):
            e = row * t / n
            out += (o - e) ** 2 / e
    return out


def _psi(ca: dict, cb: dict, eps: float = 0.5) -> float:
    levels = sorted(set(ca) | set(cb))
    na, nb, k = sum(ca.values()), sum(cb.values()), len(levels)
    out = 0.0
    for l in levels:
        p = (ca.get(l, 0) + eps) / (na + eps * k)
        q = (cb.get(l, 0) + eps) / (nb + eps * k)
        out += (p - q) * math.log(p / q)
    return out


def test_drift_report_categorical_hand_computed(spark):
    ca = {"x": 5, "y": 3, "z": 2}
    cb = {"x": 2, "y": 6, "z": 2}
    rows = [("a", l) for l, c in ca.items() for _ in range(c)] + [
        ("b", l) for l, c in cb.items() for _ in range(c)
    ]
    df = spark.createDataFrame(rows, ["g", "s"]).withColumn(
        "v", __import__("pyspark").sql.functions.lit(1.0)
    )
    out = {
        r["column"]: r
        for r in drift_report(
            df, "g", ["v"], "a", "b", cat_cols=["s"]
        ).collect()
    }
    s = out["s"]
    assert s["kind"] == "categorical"
    assert s["n_a"] == 10 and s["n_b"] == 10 and s["n_levels"] == 3
    assert s["chi2"] == pytest.approx(_chi2_2xk(ca, cb), abs=1e-5)
    assert s["psi"] == pytest.approx(_psi(ca, cb), abs=1e-5)
    assert s["ks_d"] is None and s["w1_distance"] is None
    assert s["mean_a"] is None and s["mean_b"] is None
    v = out["v"]
    assert v["kind"] == "numeric"
    assert v["chi2"] is None and v["psi"] is None
    assert v["ks_d"] == pytest.approx(0.0)


def test_drift_report_cat_level_absent_in_one_cohort(spark):
    # a level seen only in cohort b must stay finite via smoothing
    rows = [("a", "x"), ("a", "x"), ("b", "x"), ("b", "zz")]
    df = spark.createDataFrame(rows, ["g", "s"]).withColumn(
        "v", __import__("pyspark").sql.functions.lit(1.0)
    )
    s = {
        r["column"]: r
        for r in drift_report(
            df, "g", ["v"], "a", "b", cat_cols=["s"]
        ).collect()
    }["s"]
    ca, cb = {"x": 2}, {"x": 1, "zz": 1}
    assert s["psi"] == pytest.approx(_psi(ca, cb), abs=1e-5)
    assert s["chi2"] == pytest.approx(_chi2_2xk(ca, cb), abs=1e-5)
    assert math.isfinite(s["psi"]) and math.isfinite(s["chi2"])


def test_drift_report_cat_empty_cohort_nulls(spark):
    rows = [("a", "x"), ("a", "y")]
    df = spark.createDataFrame(rows, ["g", "s"]).withColumn(
        "v", __import__("pyspark").sql.functions.lit(1.0)
    )
    s = {
        r["column"]: r
        for r in drift_report(
            df, "g", ["v"], "a", "b", cat_cols=["s"]
        ).collect()
    }["s"]
    assert s["chi2"] is None and s["psi"] is None
    assert s["n_a"] == 2 and s["n_b"] == 0


def test_drift_report_rejects_overlapping_cols(spark):
    df = spark.createDataFrame([("a", 1.0)], ["g", "x"])
    with pytest.raises(ValueError):
        drift_report(df, "g", ["x"], "a", "b", cat_cols=["x"])


def test_drift_report_cat_null_levels_excluded(spark):
    rows = [("a", "x"), ("a", None), ("b", "x")]
    df = spark.createDataFrame(rows, ["g", "s"]).withColumn(
        "v", __import__("pyspark").sql.functions.lit(1.0)
    )
    s = {
        r["column"]: r
        for r in drift_report(
            df, "g", ["v"], "a", "b", cat_cols=["s"]
        ).collect()
    }["s"]
    assert s["n_a"] == 1 and s["n_b"] == 1 and s["n_levels"] == 1
