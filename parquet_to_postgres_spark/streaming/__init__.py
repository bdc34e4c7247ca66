"""Structured Streaming operators (SURVEY.md §2B T1–T6).

The reference has no streaming at all (its whole pipeline is a one-shot
batch loop, ``/root/reference/src/main.rs:74-97``); this package expresses
the event-stream capability matrix as Structured Streaming plans with
exact batch-equivalent semantics, so every query (except the watermark
late-drop demo) can be hash-checked against a DuckDB batch oracle.
"""

from .ops import (
    events_stream,
    run_stream_to_df,
    session_windows,
    sliding_window_counts,
    stateful_user_totals,
    stream_stream_click_attribution,
    streaming_dedup_keys,
    tumbling_window_counts,
    watermarked_late_drop,
)

__all__ = [
    "events_stream",
    "run_stream_to_df",
    "session_windows",
    "sliding_window_counts",
    "stateful_user_totals",
    "stream_stream_click_attribution",
    "streaming_dedup_keys",
    "tumbling_window_counts",
    "watermarked_late_drop",
]
