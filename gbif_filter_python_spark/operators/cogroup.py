"""Co-grouped custom per-key logic: ``cogroup().applyInPandas``.

Beyond-reference block (the reference is single-table row-at-a-time;
SURVEY.md §2 "absent in reference"). When two tables need genuinely
custom per-key alignment that no DataFrame operator expresses — per-key
dynamic programming over paired histories, stateful reconciliation,
pandas/NumPy model scoring against a per-key reference series — Spark's
escape hatch is

    left.groupBy(keys).cogroup(right.groupBy(keys)).applyInPandas(f, schema)

where ``f(left_pdf, right_pdf)`` receives BOTH sides of one key as
pandas frames in Arrow batches.

Scale shape: one hash shuffle of each side keyed by the cogroup keys,
Arrow-batched transfer (never per-row pickling), and executor memory
bounds ONE key's two frames — the same per-key bound as
``applyInPandasWithState``. This is deliberately the slow path: when a
JVM-side composition exists (e.g. :func:`~gbif_filter_python_spark.
operators.temporal.asof_join` expresses the merge_asof below with a
union + window scan, no Python), prefer it; the cogrouped twin here
doubles as the differential test of both paths and as the template for
logic that has no built-in equivalent.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    func: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema: StructType | str,
) -> DataFrame:
    """Generic co-grouped apply: thin, typed wrapper over
    ``groupBy(...).cogroup(...).applyInPandas`` so call sites state
    their contract (keys, output schema) in one place.

    Caveat: if ``left`` and ``right`` descend from the SAME DataFrame,
    alias-rename the right side's columns first — shared expression
    ids get deduplicated out of the right pandas frame under AQE (see
    :func:`asof_merge_cogrouped` for the pattern)."""
    return (
        left.groupby(*keys)
        .cogroup(right.groupby(*keys))
        .applyInPandas(func, schema)
    )


def asof_merge_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key ``pandas.merge_asof`` (backward: each left row takes the
    right row with the greatest ``ts_col`` ≤ its own): the cogrouped
    twin of ``temporal.asof_join``, same contract — right-side columns
    (minus key and timestamp) appended to every left row, null where a
    key has no prior right row.

    The right side should be unique per (key, ts) — pre-aggregate ties
    first — so the match is deterministic.
    """
    right_vals = [
        f for f in right.schema.fields if f.name not in (on, ts_col)
    ]
    clash = {f.name for f in right_vals} & set(left.columns)
    if clash:
        raise ValueError(
            "right value column(s) collide with left columns: "
            f"{sorted(clash)}; rename the right side first"
        )
    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(f.name, f.dataType, True) for f in right_vals]
    )
    val_names = [f.name for f in right_vals]
    int_vals = [
        f.name
        for f in right_vals
        if f.dataType.typeName() in ("long", "integer", "short", "byte")
    ]
    left_cols = list(left.columns)

    # Rename EVERY right column to a reserved prefix before cogrouping.
    # When both sides descend from the same DataFrame, left and right
    # attributes share expression ids, and the cogroup's attribute
    # dedup (under AQE) silently drops the right-side duplicates from
    # the pandas frame — renaming forces fresh, un-dedupable
    # attributes. Restored to the public names inside the merge.
    renamed = right.select(
        F.col(on).alias("__r_key"),
        F.col(ts_col).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in val_names],
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=left_cols + val_names)
        lpdf = lpdf.sort_values(ts_col, kind="mergesort")
        if rpdf.empty:
            out = lpdf.copy()
            for c in val_names:
                out[c] = None
        else:
            rsel = rpdf[["__r_ts", *[f"__r_{c}" for c in val_names]]]
            rsel = rsel.rename(
                columns={"__r_ts": ts_col}
                | {f"__r_{c}": c for c in val_names}
            )
            out = pd.merge_asof(
                lpdf,
                rsel.sort_values(ts_col, kind="mergesort"),
                on=ts_col,
                direction="backward",
            )
        # merge_asof upcasts unmatched integer columns to float64
        # (NaN); restore nullable ints so Arrow hands Spark the
        # declared long/int type with proper nulls.
        for c in int_vals:
            out[c] = out[c].astype("Int64")
        return out[left_cols + val_names]

    return (
        left.groupby(on)
        .cogroup(renamed.groupby("__r_key"))
        .applyInPandas(merge, out_schema)
    )
