"""Whole-table data profiling: one pass, one row of statistics per
column — the "what did we actually ingest" report every pipeline runs
before and after a big transform (driver-brief extension; the
reference has no profiling surface, SURVEY §2.3).

Per column: row count, null count, distinct count, numeric min/max
(NULL for non-numeric), string min/max (NULL for non-string), date/
timestamp min/max serialized as strings. All stats come from a SINGLE
aggregation pass over the table — one job, one scan; the long-form
pivot is a zero-cost explode of the 1-row aggregate.

Scale note: ``exact=True`` count-distinct per column makes Catalyst
expand the aggregate once per distinct column — fine for a profiling
job, but at 100 TB pass ``exact=False`` to use HLL++
(``approx_count_distinct``), which keeps the whole profile in one
non-expanded map-side-combinable aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_table"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_TEMPORAL = (T.DateType, T.TimestampType, T.TimestampNTZType)


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    exact: bool = True,
) -> DataFrame:
    """Long-form profile: ``(col_name, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str)`` — one output row per input
    column, computed in one aggregation pass."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(
            F.count(F.when(col.isNull(), 1)).alias(f"__null{i}")
        )
        nd = (
            F.count_distinct(col) if exact else F.approx_count_distinct(col)
        )
        aggs.append(nd.alias(f"__nd{i}"))
        dt = fields[c]
        if isinstance(dt, _NUMERIC):
            lo = F.min(col).cast("double")
            hi = F.max(col).cast("double")
        else:
            lo = hi = F.lit(None).cast("double")
        aggs += [lo.alias(f"__lo{i}"), hi.alias(f"__hi{i}")]
        if isinstance(dt, T.StringType):
            slo, shi = F.min(col), F.max(col)
        elif isinstance(dt, _TEMPORAL):
            # ISO-serialized so the profile row is type-stable
            slo = F.min(col).cast("string")
            shi = F.max(col).cast("string")
        else:
            slo = shi = F.lit(None).cast("string")
        aggs += [slo.alias(f"__slo{i}"), shi.alias(f"__shi{i}")]

    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null{i}").alias("n_nulls"),
            F.col(f"__nd{i}").alias("n_distinct"),
            F.col(f"__lo{i}").alias("min_num"),
            F.col(f"__hi{i}").alias("max_num"),
            F.col(f"__slo{i}").alias("min_str"),
            F.col(f"__shi{i}").alias("max_str"),
        )
        for i, c in enumerate(cols)
    ])
    return one.select(F.explode(rows).alias("p")).select("p.*")
