"""Streaming sketch maintenance: a count-min sketch kept current by
a Structured Streaming sink.

Pairs with :mod:`~gbif_filter_python_spark.operators.sketches` the
way ``streaming/cdc.py`` pairs with ``operators/scd.py``: the batch
module defines the sketch algebra (``cms_build`` / ``cms_merge`` /
``cms_estimate``); this sink folds each micro-batch's sketch into a
persisted one via ``foreachBatch`` — "how often has term X EVER
appeared in the stream" at O(depth × width) state, no matter how
many billions of rows have flowed past.

Versioned exactly like the CDC snapshot writer: each batch writes
``version=<batch_id>/`` with overwrite (replay-safe), merges read
the latest COMMITTED version strictly below the current batch id,
and old versions are point-in-time sketches (time travel over the
frequency history for free). The sketch is ≤ depth × width counter
rows, so the per-batch rewrite is trivially cheap — the entire point
of maintaining the sketch instead of the raw term log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (re-export surface)

from gbif_filter_python_spark.operators.sketches import cms_build, cms_merge
from gbif_filter_python_spark.streaming.cdc import _versions


def read_cms_sketch(spark, sketch_path: str, version: int | None = None):
    """Read the latest (or a specific — time travel) persisted sketch
    written by :func:`cms_sketch_writer`; compose with
    :func:`operators.sketches.cms_estimate` for point queries."""
    versions = _versions(spark, sketch_path)
    if not versions:
        raise FileNotFoundError(f"no sketch versions under {sketch_path}")
    v = version if version is not None else versions[-1]
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions}")
    return spark.read.parquet(f"{sketch_path}/version={v}")


def cms_sketch_writer(
    terms: DataFrame,
    sketch_path: str,
    checkpoint_path: str,
    term_col: str = "term",
    depth: int = 4,
    width: int = 2048,
):
    """Maintain a count-min sketch over a streaming term column.

    Per micro-batch: ``cms_build`` on the batch (one hash agg of the
    batch only) → ``cms_merge`` with the latest committed prior
    version → overwrite ``version=<batch_id>/``. A replayed batch
    re-reads the version BELOW itself and overwrites its own output,
    so duplicate delivery cannot double-count — the same
    exactly-once-without-a-commit-log contract as the CDC writer.

    Returns the started ``StreamingQuery``.
    """
    spark = terms.sparkSession

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_sketch = cms_build(
            batch_df.select(term_col), term_col, depth=depth, width=width
        )
        prior = [v for v in _versions(spark, sketch_path) if v < batch_id]
        if prior:
            prev = spark.read.parquet(
                f"{sketch_path}/version={prior[-1]}"
            )
            batch_sketch = cms_merge(prev, batch_sketch)
        batch_sketch.write.mode("overwrite").parquet(
            f"{sketch_path}/version={batch_id}"
        )

    return (
        terms.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .start()
    )
