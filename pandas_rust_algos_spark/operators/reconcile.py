"""Snapshot reconciliation: row-level diff of two table versions.

The validation primitive every pipeline migration needs at scale:
"what changed between yesterday's 100 TB snapshot and today's?" —
classified per key as added / removed / changed / unchanged, computed
as ONE full-outer hash join on the keys (AQE-sized, skew-split) with
null-safe column comparison. No collect, no per-row Python; the diff
of two 100 TB snapshots is a single co-partitioned join whose output
can be filtered to `status != 'unchanged'` before it ever leaves the
executors (predicate pushes into the join's projection).

This is also the verification half of `sources/merge.py`'s upsert:
merge writes, reconcile proves.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff", "diff_summary"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str] | str,
    compare_cols: Sequence[str],
    *,
    old_prefix: str = "old_",
    new_prefix: str = "new_",
) -> DataFrame:
    """Full-outer diff of ``old`` vs ``new`` on ``keys``: one row per
    key present in either side, with ``status`` ∈ added | removed |
    changed | unchanged and both versions of every compared column.

    Column comparison is null-safe (NULL == NULL is *unchanged*, NULL
    vs value is *changed*) — the semantics a reconciliation needs,
    where SQL's three-valued ``=`` would misclassify.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    compare_cols = list(compare_cols)
    o = old.select(*keys, *[F.col(c).alias(f"{old_prefix}{c}")
                            for c in compare_cols],
                   F.lit(1).alias("__in_old"))
    n = new.select(*keys, *[F.col(c).alias(f"{new_prefix}{c}")
                            for c in compare_cols],
                   F.lit(1).alias("__in_new"))
    j = o.join(n, keys, "full_outer")

    def differs(c: str) -> Column:
        return ~F.col(f"{old_prefix}{c}").eqNullSafe(F.col(f"{new_prefix}{c}"))

    any_diff = F.lit(False)
    for c in compare_cols:
        any_diff = any_diff | differs(c)
    status = (
        F.when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("__in_old").isNull(), F.lit("added"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.withColumn("status", status).drop("__in_old", "__in_new")


def diff_summary(diff: DataFrame) -> DataFrame:
    """Status counts of a :func:`snapshot_diff` result — the one-line
    health check (map-side-combined, output is ≤4 rows)."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
