"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.11) — this package is the
designated streaming extension: event-time windowed aggregation with
watermarks, session windows, in-stream dedup, custom stateful
operators, and streaming sketch maintenance (HLL registers folded
per micro-batch, provably equal to the batch sketch), all over the
``events`` table shape.
"""

from kingsfoil_seed_data_ingestor_spark.streaming.dedup import (
    first_seen_filter,
    streaming_corpus_dedup,
)
from kingsfoil_seed_data_ingestor_spark.streaming.events import (
    correlate_events,
    dedup_events,
    enrich_events,
    read_event_stream,
    run_to_memory,
    sessionize_gap,
    session_window_stats,
    sliding_window_counts,
    tumbling_window_counts,
    user_running_totals,
)
from kingsfoil_seed_data_ingestor_spark.streaming.sketch import (
    streaming_distinct_users_hll,
    streaming_distinct_users_kmv,
    streaming_length_quantiles,
    streaming_user_freq_cms,
)
from kingsfoil_seed_data_ingestor_spark.streaming.spans import (
    streaming_span_dedup,
)
from kingsfoil_seed_data_ingestor_spark.streaming.ingest import (
    stream_ingest_directory,
    watch_drop_directory,
)
from kingsfoil_seed_data_ingestor_spark.streaming.lsh import (
    StreamingLSHIndex,
    stream_lsh_dedup,
)

__all__ = [
    "read_event_stream",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_stats",
    "dedup_events",
    "correlate_events",
    "enrich_events",
    "user_running_totals",
    "sessionize_gap",
    "streaming_corpus_dedup",
    "streaming_distinct_users_hll",
    "streaming_distinct_users_kmv",
    "streaming_length_quantiles",
    "streaming_user_freq_cms",
    "streaming_span_dedup",
    "first_seen_filter",
    "run_to_memory",
    "stream_ingest_directory",
    "watch_drop_directory",
    "StreamingLSHIndex",
    "stream_lsh_dedup",
]
