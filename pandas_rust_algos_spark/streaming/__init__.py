from pandas_rust_algos_spark.streaming.events import (
    read_events_stream,
    tumbling_counts,
    run_available_now,
)

__all__ = ["read_events_stream", "tumbling_counts", "run_available_now"]
