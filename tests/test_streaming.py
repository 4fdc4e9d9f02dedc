"""Structured Streaming tests: the same windowed transformation runs
in batch and incremental mode and agrees (SURVEY.md §7.1 step 8)."""

from __future__ import annotations

import pytest

from gbif_filter_python_spark.streaming.windows import (
    stream_events,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Write the sf0.001 events as a small multi-file parquet dir so
    the file-source stream has files to micro-batch over."""
    from gbif_filter_python_spark.sources.io import read_table

    out = str(tmp_path_factory.mktemp("events_stream"))
    read_table(spark, "/root/testdata/sf0.001", "events").repartition(
        4
    ).write.mode("overwrite").parquet(out)
    return out


def test_batch_windowed_counts(spark, events_dir):
    events = spark.read.parquet(events_dir)
    out = windowed_event_counts(events, "1 hour")
    rows = out.collect()
    assert len(rows) > 0
    assert out.columns == [
        "window_start", "window_end", "event_type", "n_events", "sum_value",
    ]
    assert sum(r["n_events"] for r in rows) == events.count()


def test_stream_matches_batch(spark, events_dir, tmp_path):
    events = spark.read.parquet(events_dir)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in windowed_event_counts(events, "1 hour", watermark=None).collect()
    }

    stream = stream_events(spark, events_dir)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, "1 hour", watermark="4 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (
                r["n_events"],
                round(r["sum_value"], 6),
            )
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
    finally:
        q.stop()
    assert got == expected
