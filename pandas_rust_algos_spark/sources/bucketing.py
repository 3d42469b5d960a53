"""Bucketed tables: co-located joins and aggregations without a
shuffle.

At 100 TB the dominant cost of a fact-fact join (orders ⨝ lineitem) is
shuffling both sides on the join key. Writing both tables bucketed by
that key — ``df.write.bucketBy(n, key).sortBy(key)`` — pins the hash
partitioning into the table layout: Catalyst sees matching output
partitionings and plans a SortMergeJoin with **zero Exchange** on
either side. The same applies to repeated groupBy on the bucket key.

This is a *write-time* contract: bucket counts must match across
tables (or divide evenly), and the saveAsTable catalog records it.
Use for the handful of canonical join keys of a warehouse; everything
else relies on AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    *,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    managed table. Sorting by the bucket key additionally removes the
    per-task Sort from later SortMergeJoins."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog — a plain path read would lose it)."""
    return spark.table(table)
