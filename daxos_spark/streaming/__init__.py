"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.10: no watermarks, windows,
or stateful operators anywhere); this module is beyond-parity surface
for the event stream the harness `events` table models. Batch twins of
each streaming aggregation are registered as oracle-checked queries in
plans/streampipe.py — streaming and batch share the same column logic,
so the duckdb gate covers the semantics and the streaming tests cover
the incremental execution.
"""

from .pipelines import (
    dedup_events_stream,
    hourly_event_counts,
    read_events_stream,
    session_stats,
    user_running_totals,
    views_after_errors_stream,
)

__all__ = [
    "read_events_stream",
    "hourly_event_counts",
    "session_stats",
    "dedup_events_stream",
    "user_running_totals",
    "views_after_errors_stream",
]
