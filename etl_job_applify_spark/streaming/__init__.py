from .jobs import (
    events_stream,
    tumbling_counts,
    sliding_counts,
    session_aggregates,
    run_to_memory,
    run_available_now_to_memory,
    run_incremental_dedup_stream,
    run_text_index_ingest_stream,
    run_cms_sketch_stream,
    run_vector_index_ingest_stream,
    run_vector_search_stream,
    streaming_anomalies,
)

__all__ = [
    "events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_aggregates",
    "run_to_memory",
    "run_available_now_to_memory",
    "run_incremental_dedup_stream",
    "run_text_index_ingest_stream",
    "run_cms_sketch_stream",
    "run_vector_index_ingest_stream",
    "run_vector_search_stream",
    "streaming_anomalies",
]
