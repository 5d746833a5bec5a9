from kinbaku_spark.streaming.windows import (
    dedup_events,
    enrich_with_dim,
    read_events_stream,
    sessionized_stats,
    sliding_event_rates,
    tumbling_event_counts,
    user_running_totals,
)

__all__ = [
    "dedup_events",
    "enrich_with_dim",
    "read_events_stream",
    "sessionized_stats",
    "sliding_event_rates",
    "tumbling_event_counts",
    "user_running_totals",
]
