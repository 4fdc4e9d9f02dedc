"""Streaming CDC: maintain a merged snapshot from a change stream.

Beyond-reference block. Pairs with :func:`~gbif_filter_python_spark.
operators.scd.cdc_apply`: the batch operator defines the MERGE
semantics (last-writer-wins upsert/delete per key); this sink applies
it per micro-batch via ``foreachBatch``, materializing a VERSIONED
snapshot — the "table-format-less Delta" pattern:

* each micro-batch writes a complete new snapshot under
  ``version=<batch_id>/`` with ``mode("overwrite")``, so a replayed
  batch overwrites its own (possibly partial) previous output instead
  of corrupting the table — exactly-once without a commit log;
* the merge reads the latest version STRICTLY BELOW the current
  batch id, so a replay never reads its own half-written output;
* old versions remain as point-in-time snapshots (time travel for
  free); prune them with retention tooling when storage matters.

Scale notes: per batch, the snapshot side of the merge never shuffles
(cdc_apply broadcast-anti-joins the change keys); the rewrite cost is
one full snapshot write per batch — the right trade for dimension-
sized tables (the use case); fact-sized CDC belongs in a real table
format with file-level merge-on-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (re-export surface)

from gbif_filter_python_spark.operators.scd import cdc_apply


def _versions(spark: SparkSession, snapshot_path: str) -> list[int]:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(snapshot_path)
    fs = hpath.getFileSystem(conf)
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith("version="):
            try:
                v = int(name.split("=", 1)[1])
            except ValueError:
                continue
            # Only expose COMMITTED versions: Spark's FileOutputCommitter
            # writes _SUCCESS as the final act of the job, so a version
            # directory without it is a write in flight (or a crash) —
            # a reader racing the stream must not see it as "latest".
            marker = jvm.org.apache.hadoop.fs.Path(
                st.getPath(), "_SUCCESS"
            )
            if fs.exists(marker):
                out.append(v)
    return sorted(out)


def read_cdc_snapshot(
    spark: SparkSession, snapshot_path: str, version: int | None = None
) -> DataFrame:
    """Read the latest (or a specific ``version=`` — time travel)
    snapshot produced by :func:`cdc_snapshot_writer`."""
    versions = _versions(spark, snapshot_path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions under {snapshot_path}")
    v = version if version is not None else versions[-1]
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions}")
    return spark.read.parquet(f"{snapshot_path}/version={v}")


def cdc_snapshot_writer(
    changes: DataFrame,
    snapshot_path: str,
    checkpoint_path: str,
    key_cols: list[str],
    op_col: str = "op",
    ts_col: str = "change_ts",
):
    """foreachBatch sink merging a CDC change stream into the
    versioned snapshot. Returns a configured ``DataStreamWriter`` —
    call ``.start()``."""
    data_cols = [
        c for c in changes.columns if c not in (op_col, ts_col)
    ]

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prior = [v for v in _versions(spark, snapshot_path) if v < batch_id]
        if prior:
            base = spark.read.parquet(
                f"{snapshot_path}/version={prior[-1]}"
            )
        else:
            base = batch_df.select(*data_cols).limit(0)
        merged = cdc_apply(base, batch_df, key_cols, op_col, ts_col)
        merged.write.mode("overwrite").parquet(
            f"{snapshot_path}/version={batch_id}"
        )

    return (
        changes.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
