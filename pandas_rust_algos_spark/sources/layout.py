"""Z-order (Morton curve) data layout for multi-column file skipping.

Sorting a table by one column gives parquet min/max stats that prune
scans on THAT column only; predicates on any other column still read
every file. Interleaving the bits of several columns' bucket numbers
into one Morton code and range-partitioning + sorting by it keeps every
file's bounding box narrow in ALL the interleaved dimensions at once —
each column's min/max span per file is ~span/2^(bits_used/n_cols)
instead of the full domain. The same idea underlies the OPTIMIZE
ZORDER of modern lakehouse table formats; here it's spelled out as a
plain column expression so the plan is inspectable and portable.

Everything stays JVM-side whole-stage-codegen arithmetic (shift/mask/
add on longs — no UDF): the only extra cost over a normal sorted write
is one tiny min/max aggregate per layout column to calibrate buckets.

At 100 TB: write once with ``write_zordered``; every later query with
predicates on any interleaved column prunes row groups via footer
stats before reading a byte. Choose the 2-4 columns that dominate
WHERE clauses; more dimensions dilute per-column resolution.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_column", "write_zordered"]


def zorder_column(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 8,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton code over ``cols`` as a long Column.

    Each column is linearly bucketed into ``2^bits`` cells over its
    [min, max] range (one cheap global aggregate when ``ranges`` is not
    supplied — at scale, pass known domain bounds to skip even that),
    then the bucket numbers' bits are interleaved column-major:
    bit b of column i lands at position ``b * n_cols + i``. NULLs map
    to bucket 0 (sort first — co-located, still skippable).

    ``bits * len(cols)`` must fit a long (≤ 62).
    """
    cols = list(cols)
    if not cols:
        raise ValueError("zorder_column needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(
            f"bits ({bits}) × columns ({len(cols)}) exceeds a long's "
            "capacity; lower bits or interleave fewer columns")
    if ranges is None:
        agg = df.agg(*[f(c).alias(f"{n}_{c}")
                       for c in cols for n, f in (("mn", F.min), ("mx", F.max))])
        row = agg.collect()[0]
        ranges = {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in cols}

    n = len(cols)
    cells = (1 << bits) - 1
    parts: list[Column] = []
    for ci, c in enumerate(cols):
        mn, mx = ranges[c]
        if mn is None or mx is None:          # all-NULL column
            continue
        span = float(mx) - float(mn)
        if span <= 0:                          # constant column: bucket 0
            continue
        bucket = F.floor(
            (F.col(c).cast("double") - F.lit(float(mn)))
            * F.lit(float(cells)) / F.lit(span)
        ).cast("long")
        bucket = F.coalesce(
            F.least(F.greatest(bucket, F.lit(0)), F.lit(cells)), F.lit(0))
        for b in range(bits):
            bit = F.shiftright(bucket, b).bitwiseAND(F.lit(1))
            parts.append(F.shiftleft(bit, b * n + ci))
    if not parts:
        return F.lit(0).cast("long")
    # bit positions are disjoint, so sum == bitwise-or
    return functools.reduce(operator.add, parts)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    bits: int = 8,
    num_files: int = 8,
    ranges: dict[str, tuple[float, float]] | None = None,
    mode: str = "error",
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``.

    ``repartitionByRange`` on the Morton code splits the curve into
    ``num_files`` contiguous segments (each file = a compact hyper-
    rectangle-ish region), ``sortWithinPartitions`` keeps row groups
    within a file tight too. The projection dropping the helper column
    is narrow, so the sort order survives to the writer.
    """
    z = zorder_column(df, cols, bits=bits, ranges=ranges)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
