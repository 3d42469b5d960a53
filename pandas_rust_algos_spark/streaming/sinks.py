"""Streaming sinks beyond the built-ins: foreachBatch to partitioned
parquet.

``writeStream.format("parquet")`` appends blindly; production pipelines
need per-batch control — dynamic partition overwrite, dedup, merge.
``foreachBatch`` hands each micro-batch to ordinary batch code with its
``batch_id``; Spark guarantees at-least-once invocation, so the sink
must be *idempotent on batch_id* to get effectively-once output. Here
that's done by routing every batch's rows into ``batch_id=<id>``
partition directories and overwriting just those (dynamic partition
overwrite): a replayed batch rewrites its own directories byte-for-byte
instead of duplicating rows — the standard recipe when a transactional
table format (Delta/Iceberg) isn't available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_stream_partitioned"]


def write_stream_partitioned(
    stream: DataFrame,
    path: str,
    *,
    partition_by: list[str],
    checkpoint: str,
    available_now: bool = True,
):
    """Start a foreachBatch query writing hive-partitioned parquet with
    batch-replay idempotence. Returns the StreamingQuery (caller owns
    ``awaitTermination``/``stop``)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        # per-writer option, NOT a session-global conf toggle — a
        # set/restore on the shared session could flip a concurrent
        # static-mode overwrite to dynamic mid-write (ADVICE r11)
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .repartition(*partition_by)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", *partition_by)
            .parquet(path)
        )

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
