"""Pivot / reshape helpers.

``groupBy().pivot(col)`` without an explicit value list makes Spark
run a separate distinct-discovery job over the full input before it
can even plan the aggregation — at 100 TB that's a second full scan.
``pivot_explicit`` is the always-preferred form; ``pivot_dynamic``
packages the two-step discovery for when the value set is genuinely
unknown: a bounded distinct (cheap: the column is low-cardinality or
pivoting is the wrong tool) feeds the explicit list, with a hard cap
that fails fast instead of fanning out into a million columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame

__all__ = ["pivot_explicit", "pivot_dynamic", "melt"]


def pivot_explicit(
    df: DataFrame,
    index: Sequence[str] | str,
    pivot_col: str,
    values: Sequence,
    agg: Column,
) -> DataFrame:
    """pandas ``pivot_table`` with a known column domain — compiles to
    conditional aggregation in ONE pass (no discovery job)."""
    index = [index] if isinstance(index, str) else list(index)
    return df.groupBy(*index).pivot(pivot_col, list(values)).agg(agg)


def pivot_dynamic(
    df: DataFrame,
    index: Sequence[str] | str,
    pivot_col: str,
    agg: Column,
    *,
    max_values: int = 1000,
) -> DataFrame:
    """Pivot with runtime value discovery. The distinct runs with a
    ``limit(max_values + 1)`` so a high-cardinality mistake costs one
    early-terminated scan and a clear error, not a plan with 10⁶
    columns. Values are sorted for a deterministic column order."""
    vals = [
        r[0]
        for r in df.select(pivot_col).distinct().limit(max_values + 1).collect()
    ]
    if len(vals) > max_values:
        raise ValueError(
            f"pivot_dynamic: {pivot_col!r} exceeds max_values={max_values} "
            "distinct values — pivoting on it would explode the schema; "
            "pass an explicit subset via pivot_explicit instead"
        )
    return pivot_explicit(df, index, pivot_col, sorted(vals), agg)


def melt(
    df: DataFrame,
    id_vars: Sequence[str] | str,
    value_vars: Sequence[str],
    *,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """pandas ``melt`` (wide → long), the inverse of pivot.

    Compiles to Spark's native ``unpivot`` (an Expand node: each input
    row emits len(value_vars) rows in the same task) — narrow, no
    shuffle, no UDF; output size is rows × len(value_vars) regardless
    of partitioning. Value columns are cast to their common promoted
    type by Spark; pass pre-cast columns when mixing incompatible types.
    """
    id_vars = [id_vars] if isinstance(id_vars, str) else list(id_vars)
    return df.unpivot(id_vars, list(value_vars), var_name, value_name)
