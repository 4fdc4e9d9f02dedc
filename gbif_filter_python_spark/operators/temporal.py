"""Temporal join operators Spark lacks as built-ins: as-of join and
interval range join, expressed as scale-safe compositions of DataFrame
ops (brief: custom operators should be (a) compositions of existing
ops where semantics allow — both qualify; no UDF, no mapPartitions).

No reference counterpart (the reference has no temporal joins at all);
these belong to the beyond-reference training-pipeline block — joining
events to the most recent model-checkpoint/session/price row, and
joining points into time windows, are staple shapes of log and
feature-engineering pipelines.

Scale design:

* **as-of join** — the naive formulation is a non-equi theta-join
  (BroadcastNestedLoop at best, O(n·m) at worst). Here: union both
  sides tagged, ONE shuffle on the join key (the same exchange a
  sort-merge join would pay), then a linear window scan carrying the
  last-seen right row. State per row is O(1); no row explosion ever.
  Skew caveat: a window partition is one task — a single mega-key is
  not split by AQE (same caveat as any windowed analytic; pre-split
  hot keys upstream if that matters).
* **range join** — the naive BETWEEN theta-join is cartesian-shaped.
  Here: coarse time buckets turn it into an EQUI-join (hash/sort-merge,
  AQE-eligible) + exact residual filter. The point side lands in
  exactly one bucket, so no dedup pass is needed; only intervals are
  replicated, by ceil(span/bucket) + 1 — pick ``bucket_seconds`` near
  the typical interval length to keep that factor ~2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: matched right-row timestamp carried alongside the payload
ASOF_TS_COL = "_asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    include_right_ts: bool = False,
) -> DataFrame:
    """Left as-of join: for each left row, the single right row with
    the greatest ``right_ts`` <= ``left_ts`` (direction="backward",
    inclusive — DuckDB/pandas ``merge_asof`` semantics) or the smallest
    ``right_ts`` >= ``left_ts`` (direction="forward") within the same
    ``on`` key. Unmatched left rows keep null payload columns.

    The right side should be unique per (key, ts) — pre-aggregate ties
    upstream, otherwise which peer row wins is nondeterministic (the
    same caveat every as-of implementation carries).

    ``tolerance_seconds`` nulls the payload when the matched row is
    further than the tolerance from the left timestamp.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload_cols = [c for c in right.columns if c not in (on, right_ts)]
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")

    # Tag + union: right rows must sort BEFORE left rows at equal ts
    # for backward (so an exact-ts match is visible), AFTER for forward.
    left_side = 1 if direction == "backward" else 0
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(left_side).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1 - left_side).alias("_side"),
        F.struct(
            F.col(right_ts).alias(ASOF_TS_COL),
            *[F.col(c) for c in payload_cols],
        ).alias("_r"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy("_t", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_r", ignorenulls=True).over(w)
    else:
        # forward as a REVERSED running last, not first() over
        # [current, unbounded following]: Spark's unbounded-FOLLOWING
        # frame re-scans the remainder per row (O(n_k²) per key — a
        # hot key goes quadratic; measured 16+ min on one core at a
        # 450k single-key frame), while frames ending at CURRENT ROW
        # update incrementally. Reversing every sort key yields the
        # exact mirror sequence, so "last right seen walking
        # backward" ≡ "first right ahead walking forward", equal-ts
        # inclusivity preserved (_side desc puts the right row before
        # the left at equal ts in the reversed walk).
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").desc(), F.col("_side").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_r", ignorenulls=True).over(w)

    out = u.withColumn("_m", matched).filter(F.col("_side") == left_side)
    if tolerance_seconds is not None:
        delta_us = F.abs(
            F.unix_micros(F.col("_t")) - F.unix_micros(F.col("_m")[ASOF_TS_COL])
        )
        out = out.withColumn(
            "_m",
            F.when(delta_us <= tolerance_seconds * 1_000_000, F.col("_m")),
        )

    cols = [F.col("_l")[c].alias(c) for c in left.columns]
    if include_right_ts:
        cols.append(F.col("_m")[ASOF_TS_COL].alias(ASOF_TS_COL))
    cols.extend(F.col("_m")[c].alias(c) for c in payload_cols)
    return out.select(*cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join point rows into [start, end) timestamp intervals without a
    cartesian/nested-loop plan: coarse bucket equi-join + exact filter.

    Each point falls in exactly ONE bucket while intervals are exploded
    across every bucket they touch, so each qualifying (point,
    interval) pair meets exactly once — no dedup needed and unmatched
    LEFT rows survive a ``how="left"`` exactly once. Right-outer joins
    would see replicated interval rows and are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports how in {{'inner','left'}}: {how!r}")
    clash = set(right.columns) & set(left.columns)
    if clash:
        raise ValueError(f"overlapping column names: {sorted(clash)}")
    width_us = bucket_seconds * 1_000_000
    lb = left.withColumn(
        "_pb", F.floor(F.unix_micros(F.col(left_point)) / width_us)
    )
    rb = right.withColumn(
        "_ib",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(right_start)) / width_us),
                F.floor(F.unix_micros(F.col(right_end)) / width_us),
            )
        ),
    )
    cond = (
        (lb["_pb"] == rb["_ib"])
        & (F.col(left_point) >= F.col(right_start))
        & (F.col(left_point) < F.col(right_end))
    )
    return lb.join(rb, cond, how).drop("_pb", "_ib")


def resample_forward_fill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Regularize an event stream onto a fixed time grid per key,
    forward-filling gaps — the standard feature-engineering resample
    (metrics dashboards, state snapshots between sparse updates).

    Per key: bucket events to the grid step (one hash aggregation),
    derive the (min, max) bucket bounds (second tiny aggregation),
    EXPLODE a per-key ``sequence(min, max, step)`` grid (rows scale
    with key-span/step, never with pairwise joins), left-join the
    aggregated buckets back, and forward-fill with
    ``last(ignorenulls)`` over one ordered window. Two narrow
    shuffles on the key; no theta-join, no driver actions.

    Returns (key, bucket, n_events, filled_value): n_events is 0 on
    gap rows; filled_value carries the most recent non-null bucket
    aggregate (rounded before filling so propagated values are
    fp-stable).
    """
    bucket = F.date_trunc("hour", F.col(ts_col)) if step == "1 hour" else (
        F.window(F.col(ts_col), step)["start"]
    )
    hourly = events.groupBy(
        F.col(key_col).alias("key"), bucket.alias("bucket")
    ).agg(
        F.count("*").alias("_n"),
        F.round(F.sum(value_col), 4).alias("_sv"),
    )
    bounds = hourly.groupBy("key").agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    grid = bounds.select(
        "key",
        F.explode(
            F.sequence(
                F.col("_lo"), F.col("_hi"), F.expr(f"interval {step}")
            )
        ).alias("bucket"),
    )
    joined = grid.join(hourly, ["key", "bucket"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("key").alias(key_col),
        "bucket",
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
        F.last("_sv", ignorenulls=True).over(w).alias("filled_value"),
    )


def ewma(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.2,
    adjust: bool | None = None,
    out_col: str = "ewma",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key exponentially weighted moving average over event time,
    both pandas ``ewm`` variants behind one ``adjust=`` flag.

    .. warning:: **Default changed when the duplicate definitions were
       merged.** Before the merge this module accidentally defined
       ``ewma`` twice and Python's last-def-wins resolved callers to
       the ``adjust=False`` recursion; the merged function defaults to
       ``adjust=True`` (the pandas default). Any caller that relied on
       the implicit old default gets different values, so omitting
       ``adjust=`` now emits a ``FutureWarning`` (then uses the pandas
       default ``True``) — pass ``adjust=`` explicitly at every call
       site; ``adjust=False`` recovers the recursive form.

    ``adjust=True`` (default) — the weighted-mean form

        y_t = Σ_i x_i (1-α)^(t-i) / Σ_i (1-α)^(t-i)
            = running_sum(x_i · r^-i) / running_sum(r^-i),  r = 1-α

    (the common (1-α)^t factor cancels), expressed as pure window
    algebra: one window over one ordering — a single hash shuffle on
    the key, no Python in the path. BOUNDED-LENGTH caveat: r^-i
    overflows double at i ≈ ln(1.8e308)/-ln(r) (~3 100 rows/key at
    α=0.2). For unbounded per-key adjust=True history use
    :func:`ewma_stateful` (Arrow-batched, O(1) state).

    ``adjust=False`` — the recursion
    ``y_t = α·x_t + (1-α)·y_{t-1}`` seeded with the key's first value.
    Window frames aggregate INPUT rows and cannot reference previous
    OUTPUT, and the closed-form rewrite overflows for long series, so
    this path is a deliberate ``applyInPandas``: one shuffle keyed by
    ``key_col``, then vectorized ``Series.ewm`` per key (executor
    memory bounds one key's history — the sessionization-state
    contract). Output is 6dp-rounded so replays and cross-engine
    recursive-CTE oracles hash identically.

    ``tiebreak_cols`` makes the per-key ordering total when equal
    timestamps occur (pass the unique event id); without it the fold
    order of equal-ts rows is nondeterministic. Only ``[ts_col] +
    tiebreak_cols`` is ever sorted on — never arbitrary payload
    columns, which may be non-orderable (arrays/maps/structs).
    """
    if adjust is None:
        import warnings

        warnings.warn(
            "ewma() called without explicit adjust=; defaulting to "
            "adjust=True (pandas weighted-mean semantics). The "
            "pre-merge implicit default was adjust=False — pass "
            "adjust= explicitly to pin the variant you mean.",
            FutureWarning,
            stacklevel=2,
        )
        adjust = True
    tiebreak_cols = list(tiebreak_cols or [])
    if adjust:
        r = 1.0 - alpha
        order = [F.col(c).asc() for c in [ts_col, *tiebreak_cols]]
        w_ord = Window.partitionBy(key_col).orderBy(*order)
        w_run = w_ord.rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        i = F.row_number().over(w_ord) - 1
        inv = F.pow(F.lit(1.0 / r), i)
        return df.withColumn(
            out_col,
            F.sum(F.col(value_col) * inv).over(w_run)
            / F.sum(inv).over(w_run),
        )

    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    # A fresh StructType — StructType.add mutates in place, and the
    # input DataFrame's schema object must not grow a column.
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType(), True)]
    )
    cols = list(df.columns)
    sort_cols = [ts_col] + tiebreak_cols

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        pdf[out_col] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False).mean().round(6)
        )
        return pdf[cols + [out_col]]

    return df.groupBy(key_col).applyInPandas(per_key, out_schema)


def ewma_stateful(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.2,
) -> DataFrame:
    """Unbounded-length EWMA via ``applyInPandas``: one Arrow batch
    per key, sorted in-batch, pandas ``ewm`` recurrence (numerically
    stable for any length — no r^-i term). Use when per-key history
    exceeds the closed form's double-overflow bound; groups must fit
    an executor's memory (one key's history per batch), which is the
    standard applyInPandas envelope."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    # A fresh StructType — StructType.add mutates in place, and the
    # input DataFrame's schema object must not grow a column.
    schema = StructType(
        list(df.schema.fields) + [StructField("ewma", DoubleType())]
    )

    def _ewm(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        pdf["ewma"] = (
            pdf[value_col].ewm(alpha=alpha, adjust=True).mean()
        )
        return pdf

    return df.groupBy(key_col).applyInPandas(_ewm, schema=schema)


def rolling_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n: int = 7,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Trailing-``n``-row rolling statistics per key (mean, sample
    stddev, min, max, row count over the frame) — the moving-average /
    volatility-band primitive of feature pipelines.

    One window over one ordering: a single hash shuffle on the key,
    all five aggregates share the same frame (Spark evaluates them in
    one WindowExec pass — no repeated sorts). ``tiebreak_col`` makes
    the ordering total so the ROWS frame is deterministic under equal
    timestamps (same caveat as every ROWS-frame analytic; pass the
    event id).

    Rounding to 6dp keeps the output fp-stable across partitionings
    (frame sums are fixed-order here, but stddev's two-pass formula
    is not bit-exact across platforms).
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    v = F.col(value_col)
    return df.select(
        key_col,
        ts_col,
        *([tiebreak_col] if tiebreak_col else []),
        value_col,
        F.round(F.avg(v).over(w), 6).alias("roll_mean"),
        F.round(F.stddev_samp(v).over(w), 6).alias("roll_std"),
        F.round(F.min(v).over(w), 6).alias("roll_min"),
        F.round(F.max(v).over(w), 6).alias("roll_max"),
        F.count(v).over(w).alias("roll_n"),
    )




def merge_intervals(
    df: DataFrame,
    key_col: str = "key",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Union of overlapping-or-touching intervals per key:
    ``(key, start, end, n_merged)`` — the classic coverage-merge
    (uptime stitching, audio/video segment coverage, validity-range
    consolidation after an SCD merge).

    Closed-interval semantics: ``[1, 5]`` and ``[5, 9]`` touch and
    merge. An interval nested inside an earlier one extends nothing
    but still merges (the running-max-of-ends guard, not plain
    ``lag(end)`` — the textbook off-by-one that splits coverage at
    an enclosed interval's early end).

    Plan shape: ONE shuffle on the key, one in-partition sort —
    chain-building is the prefix running max + flag cumsum, both
    computed in the same window frame pass, then a hash agg on the
    derived group id. No self-join, no iteration; at 100 TB the cost
    is exactly one repartition of (key, start, end) triples.
    """
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    grp = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_grp", grp)
        .groupBy(key_col, "_grp")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).cast("int").alias("n_merged"),
        )
        .drop("_grp")
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    slack: float = 0.5,
    threshold: float = 5.0,
    tiebreak_cols: list[str] | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Two-sided CUSUM changepoint detection (Page 1954) per key:
    ``(…, cusum_hi, cusum_lo, is_change)`` where

        hi_i = max(0, hi_{i-1} + (x_i - mu - slack))
        lo_i = max(0, lo_{i-1} - (x_i - mu + slack))

    against the key's baseline mean ``mu``, flagged when either side
    crosses ``threshold``. ``slack`` and ``threshold`` are in VALUE
    units — pass ``slack = 0.5σ, threshold = 5σ`` style scalings for
    the textbook parameterization.

    The Spark-first trick: the clamped recursion has a prefix-min
    closed form — with ``S_i = Σ_{j≤i} d_j``,

        max(0, prev + d_i)  ≡  S_i - min(0, min_{j≤i} S_j)

    (induction on i), so BOTH sides compute in one window pass each
    (running sum + running min over the same sorted frame) — fully
    JVM-side whole-stage codegen, no ``applyInPandas`` recursion, no
    recursive CTE, and an exact non-recursive SQL oracle. One shuffle
    on the key, one in-partition sort — identical cost to a plain
    running total, regardless of series length.

    Determinism: the order (``ts_col`` + ``tiebreak_cols``) must be
    total per key; sums run in frame order, so cross-engine doubles
    are identical before the final ``round_dp`` rounding.
    """
    tb = tiebreak_cols or []
    w_ord = Window.partitionBy(key_col).orderBy(ts_col, *tb)
    frame = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Staged projections — window expressions cannot nest, and the
    # three stages share one (key, order) sort so Catalyst plans a
    # single Exchange + Sort for all of them.
    staged = (
        df.withColumn(
            # baseline rounds to round_dp: ONE value per key, so the
            # rounding quantum (not accumulated libm drift) defines
            # every downstream difference — the cross-engine contract.
            "_mu",
            F.round(
                F.avg(value_col).over(Window.partitionBy(key_col)),
                round_dp,
            ),
        )
        .withColumn(
            "_dhi", F.col(value_col) - F.col("_mu") - F.lit(slack)
        )
        .withColumn(
            "_dlo", -(F.col(value_col) - F.col("_mu")) - F.lit(slack)
        )
        .withColumn("_shi", F.sum("_dhi").over(frame))
        .withColumn("_slo", F.sum("_dlo").over(frame))
        .withColumn(
            "_mhi", F.least(F.lit(0.0), F.min("_shi").over(frame))
        )
        .withColumn(
            "_mlo", F.least(F.lit(0.0), F.min("_slo").over(frame))
        )
    )
    hi = F.round(F.col("_shi") - F.col("_mhi"), round_dp)
    lo = F.round(F.col("_slo") - F.col("_mlo"), round_dp)
    return staged.select(
        *df.columns,
        hi.alias("cusum_hi"),
        lo.alias("cusum_lo"),
        ((hi > threshold) | (lo > threshold)).alias("is_change"),
    )


def markov_transitions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tie_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    streams: one row ``(from_state, to_state, n, prob)`` per observed
    transition, where ``prob`` row-normalizes counts per source state
    — the behavioral-model primitive behind next-event prediction and
    funnel-anomaly checks, one level below
    :func:`~.analytics.event_sequences`' fixed-pattern matching.

    Consecutive pairs come from ``lead(state)`` within each key's
    timeline (ties broken by ``tie_col`` for determinism); a key's
    last event has no successor and drops out.

    Scale shape: ONE shuffle on ``key_col`` for the window (per-key
    partitions, fully parallel, O(1) state per row — the sessionize
    contract), then a hash aggregation that collapses to at most
    |states|^2 rows; the row-normalizing window runs on that tiny
    matrix, never the fact.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(row_tot).cast("double"), round_dp
        ).alias("prob"),
    )


def event_latency(
    from_events: DataFrame,
    to_events: DataFrame,
    on: str = "user_id",
    from_ts: str = "ts",
    to_ts: str = "ts",
    max_wait_seconds: int | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Conversion-latency funnel summary: for every *from* event, the
    time to the same key's NEXT *to* event (forward as-of, inclusive),
    reduced to ONE row ``(n_from, n_converted, conversion_rate,
    p50_latency_s, p90_latency_s, max_latency_s)`` — "how long from
    click to purchase", the companion readout to the backward
    :func:`asof_join` (which answers attribution, not latency).
    ``max_wait_seconds`` turns it into a windowed conversion (events
    converting after the window count as non-converted, the standard
    funnel convention). Percentiles are exact interpolated
    (``quantile_cont``) over the converted subset; at 100 TB swap in
    ``approx_percentile`` — noted, not defaulted, so the oracle stays
    exact.

    Scale shape: one union + key shuffle + linear window scan (the
    asof_join machinery — never a per-key nested loop), then a single
    scalar aggregation. The *to* side pre-reduces to distinct
    (key, ts) — ties carry no extra information for a latency.
    """
    tos = to_events.select(
        F.col(on), F.col(to_ts).alias("_to_ts")
    ).distinct()
    matched = asof_join(
        from_events.select(F.col(on), F.col(from_ts).alias("_from_ts")),
        tos.withColumnRenamed("_to_ts", "ts_r").select(
            on, F.col("ts_r").alias("_t2")
        ),
        on=on,
        left_ts="_from_ts",
        right_ts="_t2",
        direction="forward",
        include_right_ts=True,
    )
    # exact integer-microsecond difference, THEN one divide: the
    # cast-each-then-subtract form loses ulps that can flip an
    # interpolated percentile's 6dp rounding cross-engine
    lat = (
        F.unix_micros(F.col(ASOF_TS_COL))
        - F.unix_micros(F.col("_from_ts"))
    ) / 1e6
    if max_wait_seconds is not None:
        lat = F.when(lat <= max_wait_seconds, lat)
    # r15 optimization round: the old single aggregate computed both
    # percentiles with ``percentile()`` — one buffer holding EVERY
    # latency (single-task sort at 100 TB). Now one per-distinct-
    # latency count table feeds BOTH the scalar totals and the
    # _cdf_percentiles order statistics (the two consumers share the
    # same aggregate subtree — runtime exchange reuse materializes the
    # asof-join side once); NULL latency (non-converted) is its own
    # group so n_from still counts every *from* event.
    from gbif_filter_python_spark.operators.profile import (
        _cdf_percentiles,
    )

    per = (
        matched.select(lat.alias("_lat"))
        .groupBy("_lat")
        .agg(F.count(F.lit(1)).alias("_t"))
    )
    totals = per.agg(
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("n_from"),
        F.coalesce(
            F.sum(F.when(F.col("_lat").isNotNull(), F.col("_t"))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_converted"),
        F.max("_lat").alias("_mx"),
    )
    pcts = _cdf_percentiles(
        per, "_lat", [0.5, 0.9], ["_p50", "_p90"], weight_col="_t"
    ).select("_p50", "_p90")
    return totals.join(F.broadcast(pcts), F.lit(True), "left").select(
        "n_from",
        "n_converted",
        F.round(
            F.col("n_converted") / F.col("n_from").cast("double"),
            round_dp,
        ).alias("conversion_rate"),
        F.round("_p50", round_dp).alias("p50_latency_s"),
        F.round("_p90", round_dp).alias("p90_latency_s"),
        F.round("_mx", round_dp).alias("max_latency_s"),
    )
