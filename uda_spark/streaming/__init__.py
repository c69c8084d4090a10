from uda_spark.streaming.windows import (
    events_file_stream,
    purchase_after_signup_stream,
    hourly_counts_stream,
    sliding_counts_stream,
    sessionize_stream,
    run_stream_to_memory,
    scaled_state_partitions,
    input_bytes,
    enrich_static_stream,
    cms_sketch_stream,
)

__all__ = [
    "events_file_stream",
    "purchase_after_signup_stream",
    "hourly_counts_stream",
    "sliding_counts_stream",
    "sessionize_stream",
    "run_stream_to_memory",
    "scaled_state_partitions",
    "input_bytes",
    "enrich_static_stream",
    "cms_sketch_stream",
]
