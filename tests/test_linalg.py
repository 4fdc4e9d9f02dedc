"""Unit tests for the partial-Gram covariance reduce and the Hill
tail-index estimator — NumPy ground truth and hand-built tails."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gbif_filter_python_spark.operators.linalg import covariance_matrix
from gbif_filter_python_spark.operators.profile import hill_tail_index


def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(40, 4)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    ).repartition(3)
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(df, "embedding", dim=4).collect()
    }
    expected = np.cov(x.astype(np.float64), rowvar=False, bias=True)
    assert len(got) == 10  # upper triangle of 4x4
    for (i, j), c in got.items():
        assert i <= j
        assert c == pytest.approx(expected[i, j], abs=2e-6)


def test_covariance_ignores_null_vectors_and_reports_n(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [3.0, 6.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {
        (r["i"], r["j"]): r for r in covariance_matrix(df, "embedding", dim=2).collect()
    }
    assert all(r["n"] == 2 for r in rows.values())
    # var(x)=1, cov(x,y)=2, var(y)=4 (population, n=2)
    assert rows[(0, 0)]["cov"] == 1.0
    assert rows[(0, 1)]["cov"] == 2.0
    assert rows[(1, 1)]["cov"] == 4.0


def test_hill_tail_index_pareto_recovery(spark):
    # Exact Pareto(alpha) quantiles: x_q = (1-q)^(-1/alpha). The Hill
    # estimate over the top-k of a dense quantile grid recovers alpha.
    alpha = 2.5
    n = 2000
    vals = [(1 - (i + 0.5) / n) ** (-1.0 / alpha) for i in range(n)]
    df = spark.createDataFrame(
        [("g", float(v), i) for i, v in enumerate(vals)], ["g", "v", "id"]
    )
    (row,) = hill_tail_index(df, "g", "v", "id", k=200).collect()
    assert row["k"] == 200
    assert row["tail_index"] == pytest.approx(alpha, rel=0.15)


def test_hill_tail_index_hand_example(spark):
    # k=2: top values 8, 4, threshold 2 -> H = (ln4 + ln2)/2
    df = spark.createDataFrame(
        [("g", 8.0, 1), ("g", 4.0, 2), ("g", 2.0, 3), ("g", 1.0, 4)],
        ["g", "v", "id"],
    )
    (row,) = hill_tail_index(df, "g", "v", "id", k=2).collect()
    h = (math.log(4.0) + math.log(2.0)) / 2
    assert row["x_k1"] == 2.0
    assert row["tail_index"] == round(1.0 / h, 6)


def test_hill_tail_index_degenerate_flat_tail_is_null(spark):
    # All-equal values: ln(x/x_k1) = 0 -> H = 0 -> try_divide null.
    df = spark.createDataFrame(
        [("g", 5.0, i) for i in range(5)], ["g", "v", "id"]
    )
    (row,) = hill_tail_index(df, "g", "v", "id", k=3).collect()
    assert row["x_k1"] == 5.0
    assert row["tail_index"] is None


class TestPcaPowerIteration:
    def _vec_df(self, spark, n=200, d=8, seed=5):
        import numpy as np

        rng = np.random.default_rng(seed)
        # anisotropic cloud: dominant direction along a planted axis
        base = rng.normal(0, 0.1, size=(n, d))
        t = rng.normal(0, 3.0, size=n)
        axis = np.zeros(d)
        axis[2] = 0.8
        axis[5] = 0.6
        x = base + np.outer(t, axis)
        rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
        return (
            spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
            x.astype("float32").astype("float64"),
        )

    def test_matches_numpy_eigh(self, spark):
        import numpy as np

        from gbif_filter_python_spark.operators.linalg import (
            pca_top_component,
        )

        df, x = self._vec_df(spark)
        out = pca_top_component(df, dim=8).collect()
        assert len(out) == 8
        v = np.array([r["loading"] for r in sorted(out, key=lambda r: r["i"])])
        c = np.cov(x, rowvar=False, bias=True)
        w, vecs = np.linalg.eigh(c)
        top = vecs[:, -1]
        # sign-free comparison; power iteration at 8 steps ≈ exact here
        assert min(
            np.abs(v - top).max(), np.abs(v + top).max()
        ) < 1e-3
        lam = out[0]["eigenvalue"]
        assert abs(lam - w[-1]) < 1e-2
        ratio = out[0]["explained_ratio"]
        assert abs(ratio - w[-1] / np.trace(c)) < 1e-2
        # dominant loadings on the planted axis
        assert abs(abs(v[2]) - 0.8) < 0.05 and abs(abs(v[5]) - 0.6) < 0.05

    def test_project_scores_match_numpy(self, spark):
        import numpy as np

        from gbif_filter_python_spark.operators.linalg import (
            pca_project,
            pca_top_component,
        )

        df, x = self._vec_df(spark, n=100)
        comp = pca_top_component(df, dim=8).collect()
        v = np.array(
            [r["loading"] for r in sorted(comp, key=lambda r: r["i"])]
        )
        got = {
            r["vec_id"]: r["pc1_score"]
            for r in pca_project(df, dim=8).collect()
        }
        mu = x.mean(axis=0)
        want = (x - mu) @ v
        assert len(got) == 100
        err = max(abs(got[i] - want[i]) for i in range(100))
        assert err < 1e-3
        # centered scores average ~0
        assert abs(np.mean(list(got.values()))) < 1e-6 + 1e-3


class TestCentroidSimilarity:
    def test_identical_and_orthogonal_groups(self, spark):
        from gbif_filter_python_spark.operators.similarity import (
            centroid_similarity,
        )

        rows = (
            [("a", [1.0, 0.0, 0.0, 0.0])] * 3
            + [("b", [1.0, 0.0, 0.0, 0.0])] * 2
            + [("c", [0.0, 2.0, 0.0, 0.0])] * 2
        )
        df = spark.createDataFrame(rows, "label string, embedding array<float>")
        got = {
            (r["grp_a"], r["grp_b"]): r
            for r in centroid_similarity(df, "label", dim=4).collect()
        }
        assert got[("a", "b")]["cosine"] == 1.0
        assert got[("a", "c")]["cosine"] == 0.0
        assert (got[("a", "b")]["n_a"], got[("a", "b")]["n_b"]) == (3, 2)
        assert len(got) == 3

    def test_centroid_is_mean_not_first(self, spark):
        import math

        from gbif_filter_python_spark.operators.similarity import (
            centroid_similarity,
        )

        # group a averages to (1, 1)/2 direction; group b = (1, 0)
        rows = [
            ("a", [1.0, 0.0]),
            ("a", [0.0, 1.0]),
            ("b", [1.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, "label string, embedding array<float>")
        (r,) = centroid_similarity(df, "label", dim=2).collect()
        assert abs(r["cosine"] - 1 / math.sqrt(2)) < 1e-6


class TestMmdDrift:
    def _df(self, spark, shift):
        import numpy as np

        rng = np.random.default_rng(4)
        rows = []
        for i in range(120):
            v = rng.normal(0, 1, 4)
            rows.append((i, "a", [float(x) for x in v]))
        for i in range(120):
            v = rng.normal(shift, 1, 4)
            rows.append((1000 + i, "b", [float(x) for x in v]))
        return spark.createDataFrame(
            rows, "vec_id long, label string, embedding array<float>"
        )

    def test_same_distribution_small_shifted_large(self, spark):
        from gbif_filter_python_spark.operators.similarity import (
            mmd_drift,
        )

        (same,) = mmd_drift(
            self._df(spark, 0.0), "label", "a", "b", sigma=1.0
        ).collect()
        (shifted,) = mmd_drift(
            self._df(spark, 3.0), "label", "a", "b", sigma=1.0
        ).collect()
        assert same["n_pairs"] == 60
        # identical distributions: mmd2 ~ 0 (|z| small); strong shift:
        # mmd2 near its max and z far beyond any normal quantile
        assert abs(same["z"]) < 3.0
        # within-sample RBF mass at sigma=1 over 4 dims is ~e^-4, so
        # the shifted mmd2 lands ~0.2 — the discrimination is in z
        assert shifted["mmd2"] > 10 * abs(same["mmd2"])
        assert shifted["z"] > 5.0  # far beyond any normal quantile

    def test_unpaired_trailing_row_dropped(self, spark):
        from gbif_filter_python_spark.operators.similarity import (
            mmd_drift,
        )

        rows = [
            (i, "a", [float(i), 0.0]) for i in range(5)  # odd count
        ] + [(10 + i, "b", [0.0, float(i)]) for i in range(4)]
        df = spark.createDataFrame(
            rows, "vec_id long, label string, embedding array<float>"
        )
        (r,) = mmd_drift(df, "label", "a", "b", sigma=2.0).collect()
        # a pairs: floor(5/2)=2; b pairs: 2 -> min join = 2
        assert r["n_pairs"] == 2

    def test_rejects_bad_sigma(self, spark):
        import pytest as _pytest

        from gbif_filter_python_spark.operators.similarity import (
            mmd_drift,
        )

        df = spark.createDataFrame(
            [(1, "a", [1.0])], "vec_id long, label string, embedding array<float>"
        )
        with _pytest.raises(ValueError):
            mmd_drift(df, "label", "a", "b", sigma=0.0)


class TestPcaComponents:
    def test_matches_numpy_top2_and_scree(self, spark):
        import numpy as np

        from gbif_filter_python_spark.operators.linalg import (
            pca_components,
        )

        rng = np.random.default_rng(13)
        # two strong planted axes with distinct variances + noise
        n, d = 300, 6
        t1 = rng.normal(0, 4.0, n)
        t2 = rng.normal(0, 2.0, n)
        a1 = np.array([1.0, 0, 0, 0, 0, 0])
        a2 = np.array([0, 1.0, 0, 0, 0, 0])
        x = np.outer(t1, a1) + np.outer(t2, a2) + rng.normal(0, 0.05, (n, d))
        rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = pca_components(df, k=2, dim=d).collect()
        assert len(out) == 2 * d
        xx = x.astype("float32").astype("float64")
        c = np.cov(xx, rowvar=False, bias=True)
        w, vecs = np.linalg.eigh(c)
        by_comp = {}
        for r in out:
            by_comp.setdefault(r["component"], [None] * d)[r["i"]] = r
        v1 = np.array([r["loading"] for r in by_comp[1]])
        v2 = np.array([r["loading"] for r in by_comp[2]])
        assert min(np.abs(v1 - vecs[:, -1]).max(), np.abs(v1 + vecs[:, -1]).max()) < 1e-2
        assert min(np.abs(v2 - vecs[:, -2]).max(), np.abs(v2 + vecs[:, -2]).max()) < 1e-2
        assert abs(by_comp[1][0]["eigenvalue"] - w[-1]) < 0.05
        assert abs(by_comp[2][0]["eigenvalue"] - w[-2]) < 0.05
        # components orthogonal; scree cumulative increases correctly
        assert abs(float(v1 @ v2)) < 1e-3
        cum2 = by_comp[2][0]["cum_explained"]
        e1 = by_comp[1][0]["explained_ratio"]
        e2 = by_comp[2][0]["explained_ratio"]
        assert abs(cum2 - (e1 + e2)) < 1e-5
        assert e1 > e2

    def test_rejects_bad_k(self, spark):
        import pytest as _pytest

        from gbif_filter_python_spark.operators.linalg import (
            pca_components,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
        )
        with _pytest.raises(ValueError):
            pca_components(df, k=0)
        with _pytest.raises(ValueError):
            pca_components(df, k=3, dim=2)
