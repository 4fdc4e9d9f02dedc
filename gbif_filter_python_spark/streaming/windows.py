"""Streaming windowed aggregation over the events table.

The reference has no streaming (SURVEY.md §2 "absent in reference"),
but the engine provides it for the driver corpus's ``events`` stream
table: watermarked tumbling/sliding windows so late data is bounded
and state is evicted — the standard Structured Streaming shape that
scales horizontally (state is partitioned by group key).

The same transformation function serves batch and streaming: pass a
batch DataFrame and it's a plain windowed groupBy; pass a readStream
DataFrame and it becomes an incremental stateful plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling (or sliding) per-type event counts + value sums.

    On a stream, the watermark bounds state: windows older than
    max(event time) - watermark are finalized and evicted.
    """
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide_duration or window_duration)
    return (
        df.groupBy(win.alias("win"), F.col(type_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            type_col,
            "n_events",
            "sum_value",
        )
    )


def stream_events(
    spark: SparkSession,
    parquet_dir: str,
    schema=None,
) -> DataFrame:
    """readStream over a parquet directory (file-source streaming).

    File sources are the hermetic stand-in for Kafka here; the plan is
    identical from the first transformation on.

    TIMESTAMP_NTZ columns (tz-naive parquet micros) are cast to
    TIMESTAMP: event-time watermarks accept only ltz, and with the
    session pinned to UTC the wall-clock values are unchanged.
    """
    if schema is None:
        schema = spark.read.parquet(parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_dir)
    )
    for name, dtype in stream.dtypes:
        if dtype == "timestamp_ntz":
            stream = stream.withColumn(name, F.col(name).cast("timestamp"))
    return stream
