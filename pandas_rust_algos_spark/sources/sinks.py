"""Write-side connectors: partitioned / sorted parquet sinks.

The reference has no I/O at all (SURVEY §2.3 — data arrives as NumPy
arrays); sinks are pure driver-brief extension surface. The shapes here
are the two that matter for a 100 TB pipeline output:

- **hive-partitioned parquet** (``partitionBy``): downstream readers
  prune whole directories on the partition predicate — the write-side
  half of partition pruning;
- **sorted-within-files** (``sortWithinPartitions`` before write):
  parquet row-group min/max statistics become selective, so point/range
  predicates on the sort key skip row groups without a partition
  column's cardinality constraints.

Both paths also size output files explicitly: ``maxRecordsPerFile``
bounds the largest file, and a pre-write ``repartition(partition cols)``
avoids the classic small-files explosion (every task writing a sliver
into every partition directory — task_count × partition_count files).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_partitioned", "read_partitioned"]


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as (optionally hive-partitioned) parquet.

    ``partition_by`` routes rows with one shuffle so each partition
    directory is written by as few tasks as possible; ``sort_within``
    orders rows inside each output file so row-group stats are tight.
    """
    out = df
    if partition_by:
        # one file-per-partition-per-task ⇒ co-locate rows first
        out = out.repartition(*partition_by)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.mode(mode).option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a partitioned dataset (partition columns recovered
    from the directory layout, pruning available to Catalyst)."""
    return spark.read.parquet(path)


def partition_dirs(path: str) -> list[str]:
    """The hive partition directories present under ``path`` (for
    tests/inspection — e.g. ``['event_type=click', ...]``)."""
    return sorted(
        d for d in os.listdir(path)
        if "=" in d and os.path.isdir(os.path.join(path, d))
    )
