"""Stream-stream and stream-static joins.

Structured Streaming's stream-stream inner join buffers both sides in
state; without a time bound that state grows forever. The interval
join here is the bounded form: an explicit event-time range condition
plus watermarks on BOTH sides lets Spark evict every buffered row once
the watermark passes its join window — state is O(arrival rate × (
interval + watermark)), the only shape that survives an unbounded
ingest. The same function works on batch frames (the range condition
simply becomes part of the join predicate), preserving the repo's
batch ≡ stream discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "right_ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join right rows whose ``right_ts`` lies in
    ``[left_ts - lookback, left_ts]`` for the same ``on`` key.

    ``left_ts`` and ``right_ts`` must be DIFFERENT column names (the
    joined row carries both). On streaming inputs, watermarks are
    applied to both sides so join state is evicted; on batch inputs
    the watermark is skipped and the predicate alone decides.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must differ (both survive the join)")
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    r = r.withColumnRenamed(on, "_r_key")
    cond = (
        (F.col(on) == F.col("_r_key"))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    return l.join(r, cond, how).drop("_r_key")


def static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
    broadcast: bool = False,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    stream without any state.

    Structured Streaming plans a stream-static join per micro-batch —
    the static side is just re-joined (broadcast when small, which a
    dimension should be), NO streaming state is kept, and no watermark
    is needed. This is the scalable lookup shape for "events × slowly
    changing reference data" at any stream rate; when the dimension
    itself must evolve mid-stream, snapshot it per batch via
    ``foreachBatch`` instead.

    Only ``inner`` and ``left`` (stream side preserved) are supported:
    right/full joins against a static side are not stream-plannable.

    ``broadcast=False`` (default) lets the planner pick the strategy
    from ``autoBroadcastJoinThreshold`` stats — a large static side
    falls back to a shuffled stream-static join instead of OOMing the
    executors under a forced hint. Pass ``broadcast=True`` only when
    the dimension is known-small and stats under-estimate it.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"stream-static join supports inner/left, got {how!r}"
        )
    return stream.join(F.broadcast(dim) if broadcast else dim, on, how)
