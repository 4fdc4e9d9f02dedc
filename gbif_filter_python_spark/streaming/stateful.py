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
    idle_timeout: bool = False,
) -> DataFrame:
    """Emit one row per closed session (gap > ``gap_seconds``).

    ``idle_timeout=True`` adds ProcessingTimeTimeout so idle users'
    open sessions flush (and their state evicts) after the gap elapses
    in wall-clock time — the production setting for unbounded streams.
    It is off by default because timer batches keep the query "busy":
    ``processAllAvailable()`` (used by tests/backfills) never drains
    while timers are pending.
    """
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
                if idle_timeout:
                    state.setTimeoutDuration(gap_seconds * 1000)
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
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
