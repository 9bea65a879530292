"""Streaming transformations over an events feed.

Each function is DataFrame-in/DataFrame-out and works on BOTH a batch
DataFrame and a readStream DataFrame — the Structured Streaming unification
means one definition serves both, so the batch oracle for a streaming
operator is simply the same function applied to the full table.

Watermark discipline: the 1-hour session timeout (reference
sessionization.py:54-67) maps to `session_window(ts, '1 hour')` with a
watermark that bounds state; late events inside the watermark merge into
their session, later ones drop — the late-data contract a live pipeline
needs at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding) windowed counts per event_type with a
    watermark for state cleanup. Output: window_start, window_end,
    event_type, n_events, n_users."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "n_users",
        )
    )


def streaming_sessionize(
    events: DataFrame,
    gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Timeout sessionization on a live feed via native session windows.

    `session_window(ts, gap)` implements exactly the reference's batch
    semantics (gap > timeout ⇒ new session, sessionization.py:54-67) as
    managed streaming state: sessions close when the watermark passes
    their end. Output: one row per (user, session) with start/end/count.
    """
    return (
        events.filter(F.col("user_id").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def session_window_stats(sessions: DataFrame) -> DataFrame:
    """Per-user rollup of `streaming_sessionize` output (a second, keyed
    aggregation — in streaming this runs in the same query as a chained
    agg or a foreachBatch sink)."""
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )
