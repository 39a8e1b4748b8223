from .events import (
    dedup_events_stream,
    enrich_stream,
    matched_events_batch,
    matched_events_stream,
    read_events_stream,
    sessionized_counts_stream,
    sliding_value_stats_stream,
    tumbling_counts_batch,
    tumbling_counts_stream,
)
from .stateful import running_user_totals_stream

__all__ = [
    "dedup_events_stream",
    "enrich_stream",
    "matched_events_batch",
    "matched_events_stream",
    "read_events_stream",
    "running_user_totals_stream",
    "sessionized_counts_stream",
    "sliding_value_stats_stream",
    "tumbling_counts_batch",
    "tumbling_counts_stream",
]
