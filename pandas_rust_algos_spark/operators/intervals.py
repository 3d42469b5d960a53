"""Interval union — consolidating overlapping/touching ranges per key
into disjoint spans (the gaps-and-islands generalization from point
events to INTERVALS).

The workhorse behind validity-era stitching (SCD merge cleanup),
on-call/booking overlap resolution, IP-range consolidation, and
"total covered time" metrics. The reference has nothing like it
(SURVEY §2.3 extension surface); SQL engines express it with the
running-max island trick, which is exactly how it is built here — one
window over (key, start, end), NO self-join:

- ``prev_max`` = running max of ``end`` over all EARLIER rows
  (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING);
- a row starts a NEW island iff ``start > prev_max`` (strictly after
  everything seen so far ended — touching intervals merge, matching
  the closed-interval convention) or there is no earlier row;
- island id = running sum of the new-island flag; one groupBy emits
  each island's span and row count.

Scale shape: ONE hash shuffle on the key for the window, and the
island aggregation reuses that partitioning (the island id is a
narrower grouping of the same key) — a plan-stable two-stage pipeline
with no join, no explode, no per-row Python. Cost is the per-key sort,
O(n log n) in rows per key; keys are independent so 1000 executors
scale linearly in distinct keys.

Determinism: the ordering (start, end + caller tiebreak via stable
input) only affects which row CARRIES an island id, never the merged
spans — min/max/count per island are order-free, so results are
partitioning- and engine-invariant (full value-hash oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_intervals"]


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping or touching ``[start, end]`` intervals per
    key: returns one row per maximal disjoint span —
    ``(*key_cols, span_start, span_end, n_intervals)``.

    Rows where either bound is NULL are dropped (an unbounded interval
    needs an explicit sentinel chosen by the caller, not a silent
    ±infinity guess), and ``end < start`` rows are dropped as empty —
    dirty data cannot silently extend a span backwards.
    """
    s, e = F.col(start_col), F.col(end_col)
    base = df.where(s.isNotNull() & e.isNotNull() & (e >= s))
    w = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = base.withColumn(
        "__new", F.when(prev_max.isNull() | (s > prev_max), 1).otherwise(0)
    )
    islands = flagged.withColumn(
        "__island",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        islands.groupBy(*key_cols, "__island")
        .agg(
            F.min(start_col).alias("span_start"),
            F.max(end_col).alias("span_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("__island")
    )
