"""Slowly-changing-dimension (SCD type 2) snapshot merge.

Beyond-reference block (the reference rewrites its output CSV whole,
apply_gbif_filter.py:196-198 — it has no notion of history). At 100 TB
the dimension-maintenance pattern every warehouse pipeline needs is:
given the current versioned dimension and a batch of updates, close
changed rows (set ``valid_to``), open new versions, and pass untouched
history through — without rewriting unchanged partitions' content.

Scale design:

* ONE equi-join between the open slice of the dimension and the
  (deduplicated) update batch — hash/sort-merge on the key, AQE picks
  broadcast when the update batch is small (the common case: daily
  deltas vs a multi-TB dimension). No theta-join, no window over the
  whole dimension.
* Closed history rows never join anything — they are filtered out
  before the join and unioned back untouched (at scale: the closed
  slice is partition-pruned by ``valid_to IS NOT NULL`` layout and
  never rescanned).
* A changed key must emit TWO rows (the closed old version + the new
  open version). That is done with one ``explode`` over a per-row
  array built in the join projection — single pass, no self-union of
  the joined plan (which would run the join twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_merge", "latest_per_key", "cdc_apply", "snapshot_diff"]


def latest_per_key(
    updates: DataFrame, key_cols: list[str], ts_col: str
) -> DataFrame:
    """Reduce an update batch to the single newest row per key
    (deterministic: ties on ``ts_col`` break by the remaining columns
    ascending, so re-runs pick the same winner)."""
    others = [c for c in updates.columns if c not in (*key_cols, ts_col)]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), *[F.col(c).asc() for c in others]
    )
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    ts_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Merge an update batch into an SCD2 dimension.

    ``dim`` carries ``key_cols + tracked_cols + [valid_from, valid_to]``
    with ``valid_to IS NULL`` marking the open (current) version.
    ``updates`` carries ``key_cols + tracked_cols + [ts_col]``.

    Semantics (standard type-2):

    * closed rows pass through untouched;
    * open row, no update for its key → passes through;
    * open row, update with identical tracked values → passes through
      (``valid_from`` keeps the original effective date);
    * open row, update with different tracked values → the old version
      closes at the update timestamp and a new open version starts
      there;
    * update for a key with no open row (brand new, or all versions
      closed) → a new open version.

    Update batches with several rows per key are first reduced to the
    newest via :func:`latest_per_key` (intra-batch intermediate states
    collapse — the batch is one effective snapshot, matching MERGE
    semantics).
    """
    upd = latest_per_key(updates, key_cols, ts_col)

    closed = dim.filter(F.col(valid_to).isNotNull())
    open_rows = dim.filter(F.col(valid_to).isNull())

    u = upd.select(
        *[F.col(k).alias(f"_uk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_uv_{c}") for c in tracked_cols],
        F.col(ts_col).alias("_uts"),
    )
    cond = [open_rows[k] == u[f"_uk_{k}"] for k in key_cols]
    j = open_rows.join(u, cond, "full_outer")

    def _version(keys, values, vfrom, vto):
        return F.struct(
            *[k.alias(f"k_{name}") for name, k in zip(key_cols, keys)],
            *[v.alias(f"v_{name}") for name, v in zip(tracked_cols, values)],
            vfrom.alias("_vf"),
            vto.alias("_vt"),
        )

    cur_keys = [j[k] for k in key_cols]
    cur_vals = [j[c] for c in tracked_cols]
    upd_keys = [j[f"_uk_{k}"] for k in key_cols]
    upd_vals = [j[f"_uv_{c}"] for c in tracked_cols]

    no_update = j["_uts"].isNull()
    # No open row on the dim side of the full-outer join: the key
    # column (never null in a well-formed dimension) is the
    # discriminator, not valid_from, which a malformed open row could
    # legitimately carry as null.
    brand_new = j[key_cols[0]].isNull()
    # Null-safe per-column comparison: a tracked NULL→value (or
    # value→NULL) transition is a real change.
    unchanged = F.lit(True)
    for c in tracked_cols:
        unchanged = unchanged & j[c].eqNullSafe(j[f"_uv_{c}"])

    versions = (
        F.when(no_update, F.array(_version(cur_keys, cur_vals, j[valid_from], F.lit(None).cast(dim.schema[valid_to].dataType))))
        .when(brand_new, F.array(_version(upd_keys, upd_vals, j["_uts"], F.lit(None).cast(dim.schema[valid_to].dataType))))
        .when(unchanged, F.array(_version(cur_keys, cur_vals, j[valid_from], F.lit(None).cast(dim.schema[valid_to].dataType))))
        .otherwise(
            F.array(
                _version(cur_keys, cur_vals, j[valid_from], j["_uts"]),
                _version(upd_keys, upd_vals, j["_uts"], F.lit(None).cast(dim.schema[valid_to].dataType)),
            )
        )
    )

    merged = (
        j.select(F.explode(versions).alias("_v"))
        .select(
            *[F.col(f"_v.k_{k}").alias(k) for k in key_cols],
            *[F.col(f"_v.v_{c}").alias(c) for c in tracked_cols],
            F.col("_v._vf").alias(valid_from),
            F.col("_v._vt").alias(valid_to),
        )
    )
    return closed.select(
        *key_cols, *tracked_cols, valid_from, valid_to
    ).unionByName(merged)


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    ts_col: str = "change_ts",
) -> DataFrame:
    """Apply a CDC batch to a snapshot — MERGE (SCD type-1) semantics
    without a table format: upserts (``I``/``U``) replace the row for
    their key, deletes (``D``) remove it, untouched keys pass through.

    A key may appear many times in one batch: last-writer-wins by
    ``ts_col`` with the op as deterministic tie-break (at equal
    timestamps a delete loses to the concurrent upsert — the
    conservative choice; pass distinct timestamps for strict replay).
    If a batch carries multiple rows with identical ``(key, ts, op)``
    but different payloads there is no semantic winner, so the rank
    falls through to a stable 64-bit hash of the payload columns —
    arbitrary but deterministic across replays, engines, and
    partitionings (a plain ``row_number`` over a non-total order would
    pick whichever row the shuffle delivered first).

    Scale shape: the change batch (small) is reduced to one row per
    key with a WindowGroupLimit-prunable rank, then (a) its keys
    anti-join the snapshot — broadcastable, the snapshot itself NEVER
    shuffles — and (b) the surviving upserts union in. The snapshot's
    partitioning is preserved for the passthrough rows; only changed
    keys move. Column contract: ``changes`` carries the snapshot
    columns plus ``op_col`` and ``ts_col``.
    """
    # unknown op codes are dropped up front (declarative plan — no
    # driver-side validation job; the dropped-op count is observable
    # via df.observe if a pipeline wants the metric)
    changes = changes.filter(F.col(op_col).isin("I", "U", "D"))
    data_cols = list(snapshot.columns)
    # Map-typed columns are not hashable in Spark SQL (disallowed by
    # default since 3.0) — exclude them; any scalar/array/struct
    # payload column still makes the order total in practice.
    payload_cols = [
        f.name
        for f in snapshot.schema.fields
        if f.name not in key_cols
        and f.dataType.typeName() != "map"
    ]
    order = [
        F.desc(ts_col),
        # 'U' > 'I' > 'D' lexicographically reversed: upserts beat
        # concurrent deletes at the same timestamp
        F.desc(op_col),
    ]
    if payload_cols:
        # total-order fallback: identical (key, ts, op) with differing
        # payloads resolves by payload hash, not shuffle arrival order
        order.append(
            F.desc(F.xxhash64(*[F.col(c) for c in payload_cols]))
        )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    change_keys = latest.select(*key_cols)
    untouched = snapshot.join(
        F.broadcast(change_keys), key_cols, "left_anti"
    )
    upserts = latest.filter(F.col(op_col) != "D").select(*data_cols)
    return untouched.unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key across two table snapshots:
    ``(key_cols..., change)`` with change ∈ ``added`` / ``removed`` /
    ``changed`` / ``unchanged`` — the audit step pipelines run between
    daily corpus or dimension versions before promoting one (how many
    docs entered, left, or mutated?).

    ``compare_cols`` defaults to all non-key columns both sides share.
    Comparison is null-safe (``<=>``): a NULL→NULL column is
    unchanged, NULL→value is changed.

    Scale: ONE full outer join on the key — both snapshots shuffle
    once on the same key (co-partitioned if both are bucketed by it),
    and the change classification is a pure projection. Comparison
    hashes are computed map-side BEFORE the join (``xxhash64`` over
    the compare columns), so wide rows never cross the shuffle twice —
    only key + 8-byte fingerprint move for the unchanged majority.
    NULLs are disambiguated from empty strings by hashing a
    per-column null flag alongside the value.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]

    def _fp(df: DataFrame, side: str) -> DataFrame:
        cols = []
        for c in compare_cols:
            cols.append(F.col(c).isNull().cast("int").cast("string"))
            cols.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
        fp = (
            F.xxhash64(*cols) if cols else F.lit(0).cast("long")
        )
        return df.select(
            *[F.col(k) for k in key_cols], fp.alias(f"_fp_{side}")
        )

    o = _fp(old, "o").withColumn("_in_o", F.lit(True))
    n = _fp(new, "n").withColumn("_in_n", F.lit(True))
    joined = o.join(n, key_cols, "full_outer")
    return joined.select(
        *key_cols,
        F.when(F.col("_in_o").isNull(), F.lit("added"))
        .when(F.col("_in_n").isNull(), F.lit("removed"))
        .when(F.col("_fp_o") == F.col("_fp_n"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("change"),
    )


def temporal_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time enrichment of a fact against an SCD2 dimension:
    each fact row picks the dimension version whose
    ``[valid_from, valid_to)`` range covers its event time (open
    versions have NULL ``valid_to``) — "what segment was this
    customer in WHEN the order was placed", the query SCD2 history
    exists to answer.

    An equi-join on the business key carries the range predicate as
    the join condition (NOT a post-filter: with ``how='left'`` a
    post-filter would also drop facts that matched no version —
    losing the left semantics). Versions for a key are disjoint by
    the :func:`scd2_merge` invariant, so each fact row matches at
    most one version; no dedup pass is needed.

    Scale shape: ONE key-hash shuffle (the same co-partitioning as
    any fact-dim equi-join — range predicates on the same key add no
    extra exchange); dim sides small enough to broadcast skip even
    that. This is the set-at-a-time replacement for per-row dimension
    lookups with an "as of" parameter.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"temporal_dim_join: how must be left|inner, got {how!r}")
    f, d = fact.alias("_f"), dim.alias("_d")
    cond = None
    for k in key_cols:
        c = F.col(f"_f.{k}") == F.col(f"_d.{k}")
        cond = c if cond is None else (cond & c)
    ts = F.col(f"_f.{ts_col}")
    cond = (
        cond
        & (F.col(f"_d.{valid_from}") <= ts)
        & (F.col(f"_d.{valid_to}").isNull() | (ts < F.col(f"_d.{valid_to}")))
    )
    dim_attrs = [
        c for c in dim.columns
        if c not in key_cols and c not in (valid_from, valid_to)
    ]
    return f.join(d, cond, how).select(
        *[F.col(f"_f.{c}") for c in fact.columns],
        *[F.col(f"_d.{c}") for c in dim_attrs],
    )
