"""Structured Streaming operators.

The reference has NO streaming surface (SURVEY.md §1.1: clickstream
"sessionization" is batch over a fact table) — this module is the extension
that makes the batch operators live: the same events schema processed as an
unbounded stream with watermarks, tumbling/sliding windows, and native
session windows reproducing bdb_tools/sessionization.py semantics on a feed.
"""

from gpu_bdb_spark.streaming.ops import (
    asof_enrich_batches,
    decontaminate_batches,
    dedup_ingest_batches,
    ivf_serve_batches,
    session_window_stats,
    stream_static_enrich,
    streaming_dedup,
    streaming_event_counts,
    streaming_sessionize,
    streaming_view_purchase_join,
)

__all__ = [
    "asof_enrich_batches",
    "decontaminate_batches",
    "dedup_ingest_batches",
    "ivf_serve_batches",
    "session_window_stats",
    "stream_static_enrich",
    "streaming_dedup",
    "streaming_event_counts",
    "streaming_sessionize",
    "streaming_view_purchase_join",
]
