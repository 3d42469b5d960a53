from pandas_rust_algos_spark.streaming.events import (
    dedup_stream,
    read_events_stream,
    run_available_now,
    session_counts,
    tumbling_counts,
)
from pandas_rust_algos_spark.streaming.joins import click_to_purchase, enrich_with_dim
from pandas_rust_algos_spark.streaming.sinks import write_stream_partitioned
from pandas_rust_algos_spark.streaming.stateful import running_user_profile

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "session_counts",
    "run_available_now",
    "dedup_stream",
    "click_to_purchase",
    "enrich_with_dim",
    "running_user_profile",
    "write_stream_partitioned",
]
