from kinbaku_spark.streaming.windows import (
    dedup_events,
    read_events_stream,
    sessionized_stats,
    sliding_event_rates,
    tumbling_event_counts,
    user_running_totals,
)

__all__ = [
    "dedup_events",
    "read_events_stream",
    "sessionized_stats",
    "sliding_event_rates",
    "tumbling_event_counts",
    "user_running_totals",
]
