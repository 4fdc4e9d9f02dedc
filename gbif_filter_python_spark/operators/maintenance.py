"""Table-maintenance planning: small-file compaction bin-packing.

Beyond-reference operator (SURVEY.md §2 final row; no counterpart in
`/root/reference/`). At 100 TB the small-file problem is operational
reality: streaming ingest leaves thousands of KB-scale files per
partition and every later scan pays per-file open cost. Lakehouse
formats (Iceberg/Delta/Hudi — all public) solve it with a *compaction
planner*: group neighbouring small files into target-sized rewrite
tasks. The planning input is the file MANIFEST (metadata scale — one
row per file, millions of rows for a 100 TB table, never the data), so
the plan itself is cheap; what matters is that it is a single
window-cumsum pass, shuffled once by partition key:

* files sort within their table-partition by their order key;
* running cumulative size assigns ``bin = floor((cum - size) /
  target)`` — the classic next-fit binning where a file that straddles
  a boundary joins the bin it started in, so every bin reaches at
  least ``target`` bytes except the partition's last;
* one aggregate emits the rewrite tasks.

Deterministic, expressible in pure SQL (the DuckDB twin mirrors it
literally), no iteration, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["compaction_plan"]


def compaction_plan(
    files: DataFrame,
    partition_col: str,
    order_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Next-fit compaction bins over a file manifest.

    One row per (partition, bin): file count, total bytes, and the
    ordered range the bin covers — exactly the unit a rewrite job
    takes. One shuffle (window partitioned by ``partition_col``);
    linear in manifest rows.
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = files.withColumn(
        "bin_id",
        F.floor(
            (F.sum(size_col).over(w) - F.col(size_col)) / F.lit(target_bytes)
        ).cast("int"),
    )
    return binned.groupBy(partition_col, "bin_id").agg(
        F.count("*").alias("n_files"),
        F.sum(size_col).cast("long").alias("total_bytes"),
        F.min(order_col).alias("first_key"),
        F.max(order_col).alias("last_key"),
    )
