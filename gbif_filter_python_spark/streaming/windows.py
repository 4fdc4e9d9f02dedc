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
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """readStream over a parquet directory (file-source streaming).

    File sources are the hermetic stand-in for Kafka here; the plan is
    identical from the first transformation on.

    ``max_files_per_trigger`` is the micro-batch sizing knob: 1 gives
    one batch per file (maximal incrementality for tests); larger
    values bound the NUMBER of micro-batches when the directory has
    many part files — at scale, wall-clock is batches x per-batch
    overhead, so trigger sizing, not data volume, dominates a backfill
    over a large file listing.

    TIMESTAMP_NTZ columns (tz-naive parquet micros) are cast to
    TIMESTAMP: event-time watermarks accept only ltz, and with the
    session pinned to UTC the wall-clock values are unchanged.
    """
    if schema is None:
        schema = spark.read.parquet(parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", int(max_files_per_trigger))
        .parquet(parquet_dir)
    )
    for name, dtype in stream.dtypes:
        if dtype == "timestamp_ntz":
            stream = stream.withColumn(name, F.col(name).cast("timestamp"))
    return stream


def windowed_value_histogram(
    events: DataFrame,
    window_duration: str = "1 day",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    value_col: str = "value",
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 100.0,
) -> DataFrame:
    """Per-window equal-width value histogram — the streamable half of
    the drift monitor: ``(window_start, window_end, bin, n)``.

    ONE stateful aggregation (append-mode-safe on a stream; a plain
    groupBy on a batch frame — the same function serves both, the
    module contract). Bin edges are FIXED ([lo, hi] into ``n_bins``
    equal widths, out-of-range values clamped to the edge bins, the
    calibration_bins convention) rather than data-derived quantiles:
    a streaming monitor must bin incoming data identically forever or
    drift in the BINNING masquerades as drift in the DATA. NULL
    values are excluded.

    PSI/KS against a reference belongs DOWNSTREAM
    (:func:`psi_from_histogram` over the sink table): per-window
    shares need a second aggregation over this result, and chaining
    stateful aggregations in one streaming query trades append-mode
    portability for nothing — the histogram table is windows × bins
    rows, so the finisher is a trivial batch job on the sink.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    df = events.filter(F.col(value_col).isNotNull())
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    v = F.col(value_col).cast("double")
    bin_ = F.greatest(
        F.lit(0),
        F.least(
            F.floor((v - F.lit(lo)) / F.lit((hi - lo) / n_bins)).cast("int"),
            F.lit(n_bins - 1),
        ),
    )
    win = F.window(F.col(ts_col), window_duration)
    return (
        df.groupBy(win.alias("win"), bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "bin",
            "n",
        )
    )


def psi_from_histogram(
    hist: DataFrame,
    reference: DataFrame,
    eps: float = 1e-4,
    round_dp: int = 6,
) -> DataFrame:
    """Population Stability Index per window from a histogram table:
    ``(window_start, window_end, n_total, psi)`` — the batch finisher
    over :func:`windowed_value_histogram`'s (sink) output.

    ``reference`` is ``(bin, ref_share)`` — the frozen training-time
    distribution (shares summing to 1). PSI = Σ (p−q)·ln(p/q) with
    both shares floored at ``eps`` so empty bins contribute a large
    finite term instead of ±inf (the standard convention; same
    epsilon on both engines keeps the oracle exact). Input is
    windows × bins rows, so every step — the full-outer bin
    completion against the broadcast reference and the per-window
    windows — runs over a frame that is tiny BY CONSTRUCTION
    regardless of the event volume that produced it.
    """
    from pyspark.sql import Window as W

    ref = F.broadcast(reference.select("bin", "ref_share"))
    # complete the grid: a window missing a reference bin still pays
    # that bin's PSI term (p=eps vs q=ref_share)
    windows = hist.select("window_start", "window_end").distinct()
    grid = windows.crossJoin(ref)
    joined = grid.join(
        hist, ["window_start", "window_end", "bin"], "left"
    ).select(
        "window_start",
        "window_end",
        "bin",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        "ref_share",
    )
    tot = W.partitionBy("window_start", "window_end")
    p = F.greatest(
        F.col("n").cast("double") / F.sum("n").over(tot), F.lit(eps)
    )
    q = F.greatest(F.col("ref_share").cast("double"), F.lit(eps))
    term = (p - q) * F.log(p / q)
    return (
        joined.withColumn("_t", term)
        .withColumn("_nt", F.sum("n").over(tot))
        .groupBy("window_start", "window_end")
        .agg(
            F.max("_nt").alias("n_total"),
            F.round(F.sum("_t"), round_dp).alias("psi"),
        )
    )
