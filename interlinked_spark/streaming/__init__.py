from .ops import (
    stream_from_parquet,
    tumbling_agg,
    sliding_agg,
    session_agg,
    stream_dedup,
    stream_static_join,
    stream_stream_join,
    run_available_now,
    run_into_parquet,
    replay_shuffle_partitions,
    foreach_batch_into,
    stateful_running_counts,
)

__all__ = [
    "stream_from_parquet",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "stream_dedup",
    "stream_static_join",
    "stream_stream_join",
    "run_available_now",
    "run_into_parquet",
    "replay_shuffle_partitions",
    "foreach_batch_into",
    "stateful_running_counts",
]
