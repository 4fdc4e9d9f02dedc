"""Distributed k-means (spherical / Lloyd's) over embedding columns.

Beyond-reference block (SURVEY.md §2 final row): the IVF ANN index
(similarity.py) needs coarse centroids; this fits them in-engine
instead of assuming a label column or an external model.

Design for 100 TB:
* assignment is a broadcast of k centroids (k ≤ thousands) against the
  corpus — one scan per iteration, no shuffle of the vectors;
* the update step shuffles (cluster, position, value) scalar rows —
  posexplode + hash aggregation, map-side combined, O(n·dim) narrow
  rows, never whole-vector groups;
* lineage is truncated per iteration with ``localCheckpoint`` (same
  pattern as graph.py) so the plan does not grow with iterations;
* cosine assignment + mean update = spherical k-means (cosine is
  scale-invariant, so the un-normalized mean is a valid spherical
  update), under which total assigned similarity is non-decreasing —
  tested as the convergence invariant.

Initial centroids are a deterministic hash-ordered sample (same
device as corpus.hash_sample_k_per_group), so fits are reproducible
across runs and partitionings — rand()-seeded inits are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gbif_filter_python_spark.functions.vectors import cosine_similarity
from gbif_filter_python_spark.operators.similarity import ivf_assign


def _init_centroids(
    df: DataFrame, k: int, vec_col: str, id_col: str, seed: str
) -> DataFrame:
    h = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    w = Window.orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col), F.col(vec_col))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(
            (F.col("_rk") - 1).cast("int").alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("centroid_vec"),
        )
    )


def _mean_update(assigned: DataFrame, vec_col: str) -> DataFrame:
    """New centroid = position-wise mean of the assigned vectors.

    posexplode → one hash agg on (cluster, pos) scalar rows → regroup
    to an array sorted by position (struct sort keeps positions and
    means aligned, the collect_list order itself is nondeterministic).
    """
    by_pos = (
        assigned.select(
            "centroid_id", F.posexplode(F.col(vec_col)).alias("_p", "_x")
        )
        .groupBy("centroid_id", "_p")
        .agg(F.avg("_x").alias("_m"))
    )
    return (
        by_pos.groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("_p", "_m"))).alias("_pm"))
        .select(
            "centroid_id",
            F.transform(F.col("_pm"), lambda s: s["_m"]).alias(
                "centroid_vec"
            ),
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "kmeans",
) -> DataFrame:
    """Fit ``k`` spherical-k-means centroids in ``n_iter`` Lloyd
    iterations. Returns (centroid_id, centroid_vec, n_members).

    Clusters that lose every member keep their previous centroid (the
    left-join coalesce), so the result always has exactly ``k`` rows.
    """
    if k < 1 or n_iter < 1:
        raise ValueError("k and n_iter must be >= 1")
    centroids = _init_centroids(df, k, vec_col, id_col, seed).localCheckpoint(
        eager=True
    )
    vecs = df.select(F.col(id_col), F.col(vec_col))
    for _ in range(n_iter):
        assigned = ivf_assign(
            vecs, centroids, vec_col=vec_col, id_col=id_col
        )
        updated = _mean_update(assigned, vec_col)
        centroids = (
            centroids.select("centroid_id", F.col("centroid_vec").alias("_old"))
            .join(updated, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("centroid_vec"), F.col("_old")).alias(
                    "centroid_vec"
                ),
            )
            .localCheckpoint(eager=True)  # truncate lineage per round
        )
    sizes = (
        ivf_assign(vecs, centroids, vec_col=vec_col, id_col=id_col)
        .groupBy("centroid_id")
        .agg(F.count("*").alias("n_members"))
    )
    return centroids.join(sizes, "centroid_id", "left").select(
        "centroid_id",
        "centroid_vec",
        F.coalesce(F.col("n_members"), F.lit(0)).alias("n_members"),
    )


def assignment_quality(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One-row (total_sim, n) quality summary: the spherical-k-means
    objective (sum of each vector's cosine to its centroid)."""
    assigned = ivf_assign(df, centroids, vec_col=vec_col, id_col=id_col)
    sim = assigned.join(centroids, "centroid_id").select(
        cosine_similarity(F.col(vec_col), F.col("centroid_vec")).alias("_s")
    )
    return sim.agg(
        F.sum("_s").alias("total_sim"), F.count("*").alias("n")
    )
