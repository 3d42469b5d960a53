from pandas_rust_algos_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    session_counts,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "session_counts",
    "run_available_now",
]
