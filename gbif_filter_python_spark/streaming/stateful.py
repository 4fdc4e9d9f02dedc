"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the brief's named mechanism for operators
Structured Streaming lacks built-in).

Batch twin: the lag+cumsum sessionization in ``__spark_entry__
.q_sessionize``. The streaming version keeps one small state row per
user (open-session aggregates) and emits a row per CLOSED session —
state is partitioned by user key, so it scales horizontally, and
event-time timeouts evict idle users' state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("sum_value", DoubleType()),
    ]
)

#: per-user open-session state: (start_us, end_us, n_events, sum_value)
_STATE_SCHEMA = "start long, end long, n int, s double"


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "2 hours",
    timeout: str = "none",
) -> DataFrame:
    """Emit one row per closed session (gap > ``gap_seconds``).

    ``timeout`` selects how idle users' open sessions flush (and their
    state evicts):

    * ``"none"`` (default) — state persists until a later event of the
      same user closes the session. Right for bounded backfills and
      tests (``processAllAvailable()`` drains cleanly).
    * ``"event"`` — EventTimeTimeout: the session flushes when the
      WATERMARK passes session_end + gap. This is the production
      setting for unbounded streams — eviction is aligned with event
      time, so late data within the watermark can still extend a
      session, and an idle user's state cannot accumulate forever.
      Requires a non-None ``watermark``.
    * ``"processing"`` — ProcessingTimeTimeout: flush after the gap
      elapses in wall-clock time. Simpler but decoupled from event
      time; pending timers also keep ``processAllAvailable()`` busy,
      so prefer ``"event"`` unless the stream has no usable event time.
    """
    if timeout not in ("none", "event", "processing"):
        raise ValueError(f"timeout must be none|event|processing, got {timeout!r}")
    if timeout == "event" and not watermark:
        raise ValueError("timeout='event' requires a watermark")
    gap_us = gap_seconds * 1_000_000

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start, end, n, s = state.get
                closed.append((user, start, end, n, s))
                state.remove()
        else:
            rows: list[tuple[int, float]] = []
            for pdf in pdfs:
                ts_us = pdf[ts_col].astype("datetime64[us]").astype("int64")
                for t, v in zip(ts_us, pdf[value_col]):
                    rows.append((int(t), float(v)))
            rows.sort()
            if state.exists:
                start, end, n, s = state.get
            else:
                start = end = n = s = None
            for t, v in rows:
                if start is None:
                    start, end, n, s = t, t, 1, v
                elif t - end > gap_us:
                    closed.append((user, start, end, n, s))
                    start, end, n, s = t, t, 1, v
                else:
                    end, n, s = max(end, t), n + 1, s + v
            if start is not None:
                state.update((start, end, n, s))
                if timeout == "processing":
                    state.setTimeoutDuration(gap_seconds * 1000)
                elif timeout == "event":
                    # Flush when the watermark passes session_end + gap.
                    # setTimeoutTimestamp requires a value strictly
                    # beyond the current watermark; if the watermark has
                    # already passed (late-arriving group), fire at the
                    # next opportunity instead of erroring.
                    wm_ms = state.getCurrentWatermarkMs()
                    state.setTimeoutTimestamp(
                        max(end // 1000 + gap_seconds * 1000, wm_ms + 1)
                    )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[2] for c in closed], unit="us"
                    ),
                    "n_events": pd.array(
                        [c[3] for c in closed], dtype="int32"
                    ),
                    "sum_value": [c[4] for c in closed],
                }
            )

    df = events
    if df.isStreaming and watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(user_col).applyInPandasWithState(
        _update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf={
            "none": GroupStateTimeout.NoTimeout,
            "event": GroupStateTimeout.EventTimeTimeout,
            "processing": GroupStateTimeout.ProcessingTimeTimeout,
        }[timeout],
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4 arbitrary-state API, RocksDB-backed)
# ---------------------------------------------------------------------------

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def running_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user RUNNING totals across micro-batches via Spark 4's
    ``transformWithStateInPandas`` — the successor of
    ``applyInPandasWithState`` (SPARK-46815, state-v2): typed state
    handles (ValueState/ListState/MapState), per-state TTL, and the
    RocksDB state-store backend with changelog checkpointing, which
    is what makes very large keyspaces (billions of users) viable —
    state lives off-heap per key-range, not in executor heap.

    Emits one ``(user_id, n_events, sum_value)`` row per user per
    micro-batch that touched the user — cumulative totals since the
    stream started (Update output mode). The batch twin is a plain
    ``groupBy(user).agg(count, sum)`` over everything ingested so
    far; `tests/test_streaming.py` pins stream ≡ batch.

    Requires ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider (transformWithState rejects the
    HDFS-backed default) and the ``protobuf`` package (the state-v2
    Python protocol wire format; bundled with pyspark on real
    clusters, absent in this container — the differential test
    ``importorskip``s it, mirroring the multimodal codec gating).
    """
    from pyspark.sql.streaming import StatefulProcessor

    class _RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._totals = handle.getValueState(
                "totals", "n bigint, s double"
            )

        def handleInputRows(self, key, rows, timerValues):
            prev = self._totals.get() if self._totals.exists() else (0, 0.0)
            n, s = int(prev[0]), float(prev[1])
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )

        def close(self) -> None:
            """Required StatefulProcessor hook; this processor holds
            no resources outside the state store, so there is nothing
            to release."""

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
