from kinbaku_spark.streaming.ann_ingest import (
    ann_ingest_batch,
    ann_ingest_to_parquet,
    seed_centroids,
)
from kinbaku_spark.streaming.graph_cc import (
    cc_ingest_batch,
    cc_ingest_to_parquet,
    cc_read_state,
)
from kinbaku_spark.streaming.media_ingest import (
    decode_audio_stream,
    decode_image_stream,
)
from kinbaku_spark.streaming.windows import (
    correlate_event_pairs,
    correlate_event_pairs_outer,
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
    "ann_ingest_batch",
    "ann_ingest_to_parquet",
    "seed_centroids",
    "cc_ingest_batch",
    "cc_ingest_to_parquet",
    "cc_read_state",
    "decode_audio_stream",
    "decode_image_stream",
    "correlate_event_pairs",
    "correlate_event_pairs_outer",
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
