from wicsmmiretl_spark.streaming.windows import (
    read_event_stream,
    sliding_counts,
    session_aggregate,
    stream_dedup,
    tumbling_aggregate,
)

__all__ = [
    "read_event_stream",
    "tumbling_aggregate",
    "sliding_counts",
    "session_aggregate",
    "stream_dedup",
]
