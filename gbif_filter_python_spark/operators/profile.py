"""One-pass table profiling — the "what is in this table" primitive a
data pipeline runs before trusting a new snapshot.

Beyond-reference block (SURVEY.md §2 final row): the reference has no
profiling at all; a 100 TB ingest needs per-column null/distinct/range
stats without one job per column.

Design for scale: ALL columns' statistics are computed in ONE
aggregation pass over the table (one scan, map-side partial aggregates,
a single 1-row result), then unpivoted driver-side-free with ``stack``
into the long (column, stat...) shape. Distinct counts default to
``approx_count_distinct`` (HLL — constant memory per column); exact
mode exists for small tables and oracle checks but plans an EXPAND
(one shuffled copy of the input per distinct aggregate), which is the
documented cost of exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profile: (column, n_nonnull, n_distinct, min_value,
    max_value) plus the table row count on every row.

    min/max are cast to string so heterogeneous column types fit one
    output schema (the profile is a report, not an input to further
    arithmetic).
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        distinct = (
            F.count_distinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            distinct.alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_mn_{c}"),
            F.max(c).cast("string").alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    stacked = row.select(
        F.col("_n_rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nonnull, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column", "n_rows", "n_nonnull", "n_distinct", "min_value", "max_value"
    )
