"""Incremental view maintenance: delta propagation for join +
aggregate views (insert-only deltas).

The persisted-rollup operators (``sketches.build_rollup`` /
``merge_rollup``) maintain SINGLE-TABLE aggregates incrementally;
this module closes the gap for views over a JOIN — the nightly
"revenue by month" view should absorb a day of new orders and line
items without rescanning seven years of history.

The algebra (classic counting-free insert-only IVM, e.g. Gupta &
Mumick 1995):

    V      = γ(A ⋈ B)
    ΔV     = γ(ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB)
    V_new  = merge(V, ΔV)          -- sum/count measures add cell-wise

The three delta joins each have ONE small side (the delta), so at
100 TB they plan as broadcast joins against the big stored side —
the full A ⋈ B join never re-executes. ``merge_agg_view`` is a plain
keyed sum, the same mergeable-measure contract as ``merge_rollup``
(sum/count merge losslessly; avg must be carried as sum+count;
min/max merge for insert-only deltas).

Correctness is DIFFERENTIAL by construction: the maintained view
must hash-match a full recompute over (A ∪ ΔA) ⋈ (B ∪ ΔB) — which is
exactly what the DuckDB oracle of the ``ivm_join_view`` query runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """Rows ADDED to ``A ⋈ B`` by insert-only deltas ΔA, ΔB:
    ``ΔA ⋈ B_old ∪ A_old ⋈ ΔB ∪ ΔA ⋈ ΔB`` (inner equi-join on
    ``on``). Each term broadcasts its delta side when small — the
    stored sides are probed, never re-joined against each other.
    """
    parts = [
        a_delta.join(b_old, on),
        a_old.join(b_delta, on),
        a_delta.join(b_delta, on),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def merge_agg_view(
    view: DataFrame,
    delta_view: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Merge two aggregate views with identical schemas cell-wise:
    every non-key column must be a MERGEABLE measure (sum or count —
    they add; carry avg as sum+count and derive at read time). One
    keyed aggregation over view ∪ Δview; the history view is touched
    only at its (small) aggregate granularity, never at row level.
    """
    measures = [c for c in view.columns if c not in key_cols]
    if view.columns != delta_view.columns:
        raise ValueError(
            "merge_agg_view: view and delta_view schemas differ: "
            f"{view.columns} vs {delta_view.columns}"
        )
    u = view.unionByName(delta_view)
    return u.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in measures]
    )
