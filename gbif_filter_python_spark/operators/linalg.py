"""Distributed linear algebra over embedding columns: the partial-Gram
pattern.

Beyond-reference block (SURVEY.md §2 final row; no counterpart in
`/root/reference/`). The covariance matrix of an embedding column is
the front door to PCA/whitening/ZCA for training-data curation, and
its scale-correct Spark shape is NOT the obvious one:

* posexplode-squared (one row per (vector, i, j)) shuffles
  ``n x d^2`` rows — dead at 100 TB;
* the right shape is the **partial-Gram reduce**: each Arrow batch
  computes its local ``X^T X`` (a NumPy matmul, ~ns/element), emits
  only the ``d(d+1)/2`` upper-triangle partials, and a single hash
  aggregate sums partials across batches. The shuffle carries
  ``O(partitions x d^2)`` rows — independent of n — exactly like the
  k-means centroid and CMS sketch reducers elsewhere in this repo.

The DuckDB oracle twin recomputes the same sums via an explicit
(i, j) unnest join at sf0.01 scale, proving the partials compose to
the full-scan answer (6dp — summation-order fp noise only).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["covariance_matrix"]


def covariance_matrix(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Upper-triangle covariance entries of an ``array<float>`` column.

    One row per (i, j), i <= j: ``n``, ``cov`` (population covariance,
    6dp). Single scan; shuffle is bounded by partitions x d^2.
    """
    import numpy as np

    if dim is None:
        dim = len(
            df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()[0]
        )
    d = dim
    iu = np.triu_indices(d)

    def partial_gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = pdf[vec_col].dropna()
            if not len(vecs):
                continue
            x = np.stack(vecs.to_numpy()).astype(np.float64)
            g = x.T @ x
            s = x.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "n_part": np.int64(len(x)),
                    "sxy": g[iu],
                    "sxi": s[iu[0]],
                    "sxj": s[iu[1]],
                }
            )

    from gbif_filter_python_spark.operators.dedup import _ensure_parallelism

    # The matmul is CPU-bound: a single-file parquet input must not
    # pin the whole Gram pass to one core.
    partials = _ensure_parallelism(df.select(vec_col)).mapInPandas(
        partial_gram, "i int, j int, n_part long, sxy double, sxi double, sxj double"
    )
    n = F.sum("n_part")
    return (
        partials.groupBy("i", "j")
        .agg(
            n.alias("n"),
            # + 0.0 canonicalizes IEEE -0.0 to +0.0 after rounding.
            (
                F.round(
                    (F.sum("sxy") - F.sum("sxi") * F.sum("sxj") / n) / n, 6
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def _collect_cov(df: DataFrame, vec_col: str, dim: int | None):
    """Collect the 6dp-rounded covariance as BOUNDED driver model
    state (d(d+1)/2 rows) and rebuild the full symmetric matrix —
    the shared front end of every PCA entry point."""
    import numpy as np

    rows = covariance_matrix(df, vec_col, dim).collect()
    d = max(r["j"] for r in rows) + 1
    C = np.zeros((d, d))
    for r in rows:
        C[r["i"], r["j"]] = r["cov"]
        C[r["j"], r["i"]] = r["cov"]
    return C, d


def _power_iterate(
    df: DataFrame,
    vec_col: str,
    dim: int | None,
    n_iter: int,
):
    """Shared PCA driver core: distributed 6dp-rounded covariance
    (:func:`covariance_matrix` — partial-Gram reduce, the only fact
    scan) collected as BOUNDED model state (d(d+1)/2 rows, ~2k cells
    at d=64 — the k-means-centroid contract), then a fixed
    ``n_iter``-step power iteration in NumPy on the driver. Returns
    ``(v, lam, trace, d)``.

    Determinism contract: iterating on the ROUNDED covariance — the
    exact numbers the covariance oracle already pins cross-engine —
    from the exact-dyadic init ``1/sqrt(d)`` with a FIXED iteration
    count (an estimator, not a tolerance solver) makes the whole
    trajectory replayable as unrolled SQL CTEs; remaining divergence
    is matvec summation order (~1e-13), far under 6dp.
    """
    import numpy as np

    C, d = _collect_cov(df, vec_col, dim)
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(n_iter):
        w = C @ v
        v = w / np.linalg.norm(w)
    lam = float(v @ (C @ v))
    trace = float(np.trace(C))
    return v, lam, trace, d


def pca_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    n_iter: int = 8,
    round_dp: int = 6,
) -> DataFrame:
    """Top principal component of an embedding column: one row per
    dimension ``(i, loading, eigenvalue, explained_ratio)`` with the
    dominant eigenvalue and its share of total variance repeated
    (self-contained frame). The PCA front door this module's
    :func:`covariance_matrix` docstring promises: Gram on the
    executors, eigenvector on the driver — the decomposition step is
    O(d²) work on a broadcast-scale matrix and NEVER belongs in a
    distributed job at d ≪ n.

    Scale shape: exactly one fact scan (the partial-Gram reduce);
    everything after is driver arithmetic on d² doubles. Loadings
    keep power-iteration's sign continuity from the all-positive
    init — no post-hoc sign canonicalization needed for the oracle.
    """
    v, lam, trace, d = _power_iterate(df, vec_col, dim, n_iter)
    spark = df.sparkSession
    out = spark.createDataFrame(
        [
            (
                i,
                round(float(v[i]), round_dp) + 0.0,
                round(lam, round_dp),
                round(lam / trace, round_dp),
            )
            for i in range(d)
        ],
        "i int, loading double, eigenvalue double, "
        "explained_ratio double",
    )
    return out


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    n_iter: int = 8,
    round_dp: int = 6,
) -> DataFrame:
    """Per-vector projection onto the top principal component:
    ``(id, pc1_score)`` with the mean-centered score
    ``(x − μ)·v = x·v − μ·v``. The 1-D curation coordinate behind
    "bucket the corpus by its dominant embedding axis" (outlier
    slices at the tails, stratified sampling along the component).

    Scale shape: the component comes from :func:`_power_iterate`
    (one fact scan); per-dim means come from ONE hash aggregation of
    d column sums (no explode — a 64-expression agg, map-side
    combined); the projection pass is a pure-Column zip_with/
    aggregate fold against the broadcast literal component — JVM
    whole-stage codegen, zero Python in the per-row path.
    """
    import numpy as np

    v, _, _, d = _power_iterate(df, vec_col, dim, n_iter)
    base = df.filter(F.col(vec_col).isNotNull())
    sums = base.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.col(vec_col)[i].cast("double")).alias(f"s{i}")
            for i in range(d)
        ],
    ).first()
    mu = np.array([sums[f"s{i}"] / sums["n"] for i in range(d)])
    center = float(mu @ v)
    vlit = F.array(*[F.lit(float(x)) for x in v])
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            vlit,
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return base.select(
        F.col(id_col),
        (F.round(dot - F.lit(center), round_dp) + F.lit(0.0)).alias(
            "pc1_score"
        ),
    )


def pca_components(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 2,
    dim: int | None = None,
    n_iter: int = 8,
    round_dp: int = 6,
) -> DataFrame:
    """Top-``k`` principal components via power iteration with
    Hotelling deflation: after extracting ``(v_c, λ_c)`` the matrix
    deflates to ``C − λ_c v_c v_cᵀ`` and the iteration repeats — one
    row per (component, dimension) with ``loading``, the component's
    ``eigenvalue`` / ``explained_ratio`` and the running
    ``cum_explained`` (the scree readout that answers "how many
    dimensions does this embedding column really have"). Same
    determinism contract as :func:`pca_top_component`: fixed
    iterations on the driver's 6dp-rounded covariance from the
    exact-dyadic init, so the full deflation trajectory — including
    every intermediate UNROUNDED value — replays as SQL. Close
    eigenvalue ties converge slowly (a power-method property, not an
    instability): both engines walk the identical trajectory, so
    cross-engine agreement holds regardless.

    Scale shape: identical to pca_top_component — ONE fact scan
    (partial-Gram reduce); everything after is O(k·d²) driver
    arithmetic on a broadcast-scale matrix.
    """
    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    C, d = _collect_cov(df, vec_col, dim)
    if k > d:
        raise ValueError(f"k={k} exceeds dimensionality d={d}")
    trace = float(np.trace(C))
    out = []
    lam_sum = 0.0
    for comp in range(1, k + 1):
        v = np.full(d, 1.0 / np.sqrt(d))
        for _ in range(n_iter):
            w = C @ v
            v = w / np.linalg.norm(w)
        lam = float(v @ (C @ v))
        lam_sum += lam
        for i in range(d):
            out.append(
                (
                    comp,
                    i,
                    round(float(v[i]), round_dp) + 0.0,
                    round(lam, round_dp),
                    round(lam / trace, round_dp),
                    round(lam_sum / trace, round_dp),
                )
            )
        C = C - lam * np.outer(v, v)
    return df.sparkSession.createDataFrame(
        out,
        "component int, i int, loading double, eigenvalue double, "
        "explained_ratio double, cum_explained double",
    )


def participation_ratio(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Participation-ratio effective dimension of an embedding
    column (Gao et al. 2017's neural-dimensionality measure; also the
    inverse participation ratio of physics): with covariance
    eigenvalues λ,

        PR = (Σλ)² / Σλ² = trace(C)² / ‖C‖_F²

    — how many dimensions the variance HONESTLY occupies, on a
    1..d scale. The eigendecomposition is never needed: both traces
    are polynomial in the covariance entries (Σλ = Σ C_ii,
    Σλ² = Σ_ij C_ij², since trace(C²) = ‖C‖_F² for symmetric C), so
    the statistic reduces to one re-aggregation of
    :func:`covariance_matrix`'s d(d+1)/2 output rows — the spectral
    companion to :func:`~.similarity.isotropy` that datasheets quote
    when "d=64" overstates the usable capacity. Both engines
    re-aggregate the 6dp-ROUNDED covariance entries, so the statistic
    is cross-engine exact by construction.

    Output: ONE row ``(d, n, trace_cov, frob_sq, participation_ratio,
    pr_fraction)`` — ``pr_fraction`` = PR/d ∈ (0, 1]. NULL statistics
    when ‖C‖_F² = 0 (constant embeddings).

    Scale shape: inherits :func:`covariance_matrix`'s single-scan
    partial-Gram reduce (shuffle bounded by partitions × d²); the
    re-agg runs on d(d+1)/2 rows — driver-free, corpus-free.
    """
    cov = covariance_matrix(df, vec_col, dim)
    diag = F.when(F.col("i") == F.col("j"), F.col("cov"))
    # off-diagonal (i < j) entries appear once in the upper triangle
    # but twice in the full matrix's Frobenius norm
    w = F.when(F.col("i") == F.col("j"), F.lit(1.0)).otherwise(F.lit(2.0))
    agg = cov.agg(
        F.max(F.col("j")).alias("_mx"),
        F.max(F.col("n")).alias("n"),
        F.sum(diag).alias("tr"),
        F.sum(w * F.col("cov") * F.col("cov")).alias("fro2"),
    )
    pr = F.when(
        F.col("fro2") > 0, F.col("tr") * F.col("tr") / F.col("fro2")
    )
    d = F.col("_mx") + 1
    return agg.select(
        d.cast("int").alias("d"),
        F.col("n").cast("long").alias("n"),
        F.round("tr", 6).alias("trace_cov"),
        F.round("fro2", 6).alias("frob_sq"),
        F.round(pr, 6).alias("participation_ratio"),
        F.round(pr / d, 6).alias("pr_fraction"),
    )
