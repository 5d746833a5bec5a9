from kinbaku_spark.streaming.windows import (
    dedup_events,
    dedup_ingest_batch,
    dedup_ingest_to_parquet,
    enrich_with_dim,
    heavy_hitters_to_parquet,
    rank_heavy_hitters,
    read_events_stream,
    sessionized_stats,
    sliding_event_rates,
    tumbling_event_counts,
    user_running_totals,
    windowed_heavy_hitters,
)

__all__ = [
    "dedup_events",
    "dedup_ingest_batch",
    "dedup_ingest_to_parquet",
    "enrich_with_dim",
    "heavy_hitters_to_parquet",
    "rank_heavy_hitters",
    "read_events_stream",
    "sessionized_stats",
    "sliding_event_rates",
    "tumbling_event_counts",
    "user_running_totals",
    "windowed_heavy_hitters",
]
