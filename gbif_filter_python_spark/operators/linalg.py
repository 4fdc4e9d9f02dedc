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
