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

import os

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
    per-task Sort from later SortMergeJoins.

    Idempotent across SESSIONS, not just catalogs: with an in-memory
    metastore, a managed table's files can outlive the catalog entry,
    and ``mode("overwrite")`` then fails with LOCATION_ALREADY_EXISTS
    because there is no table to drop. When the table EXISTS the drop
    removes its (catalog-resolved) location; the path-guess fallback
    for orphaned locations is scoped to unqualified names in the
    default database — the only case where ``<warehouse>/<tbl>`` is
    the actual managed location (qualified names live under
    ``<db>.db/<tbl>``, where a blind rmtree could hit an unrelated
    same-named directory)."""
    spark = df.sparkSession
    existed = spark.catalog.tableExists(table)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if not existed and "." not in table \
            and spark.catalog.currentDatabase() == "default":
        try:
            warehouse = spark.conf.get("spark.sql.warehouse.dir")
        except Exception:
            warehouse = None
        if warehouse:
            import shutil
            from urllib.parse import unquote, urlparse

            loc = urlparse(warehouse)
            root = unquote(loc.path) if loc.scheme in ("", "file") else None
            if root:
                orphan = os.path.join(root, table.lower())
                if os.path.exists(orphan):
                    shutil.rmtree(orphan, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog — a plain path read would lose it)."""
    return spark.table(table)
