"""Streaming windowed aggregation over event time with watermarks.

The batch twins of these operators live in queries/windows.py
(sessionization) and queries/relational.py (calendar aggregation);
these are the readStream forms with late-data handling.

All three return UNSTARTED streaming DataFrames — callers pick sink
and trigger. Tests drive them with a file source + availableNow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_stats(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time windows: per (window, event_type) count and
    value sum. The watermark bounds state: windows older than
    max(event time) - watermark finalize and evict."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_window_stats(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding windows (each event lands in duration/slide windows)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration, slide))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            "avg_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: drop repeats of a key arriving within
    the watermark window (at-least-once sources -> effectively-once
    pipelines). State holds one entry per key seen inside the
    watermark horizon and is evicted as the watermark advances — the
    bounded-state form of batch dropDuplicates, which at 100 TB of
    stream history would otherwise need unbounded state."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity — the streaming twin of window_sessionize_events, with
    state eviction driven by the watermark instead of a global sort."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
