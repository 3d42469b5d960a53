"""Bucketed range (interval) join.

Joining points to intervals (``start <= point < end``) has no equi-key,
so a naive theta join degenerates to a broadcast-nested-loop — a cross
join at 100 TB. The standard distributed fix is *bucket banding*: pick
a bucket width W, explode each interval into the buckets it covers,
bucket each point once, equi-join on the bucket (hash shuffle, AQE-
sizable), and re-check the exact predicate. Each point lives in exactly
one bucket, so no post-join dedup is needed. Cost scales with
points + Σ interval_width/W instead of points × intervals; W should be
on the order of the median interval width (too small explodes the
interval side, too big fattens buckets toward the cross join).

AQE cannot save the naive form; Databricks' range-join hints implement
exactly this banding natively — here it's spelled out as a composition
so the plan is inspectable and portable.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    *,
    bucket_seconds: int = 86_400,
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point < end`` (plus ``extra_keys`` equality), via bucket
    banding on timestamp columns.
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")

    def b(c: Column) -> Column:
        # cast("timestamp") tolerates TIMESTAMP_NTZ scans (UTC session ⇒ exact)
        return F.floor(
            F.unix_timestamp(c.cast("timestamp")) / F.lit(bucket_seconds)
        ).cast("long")

    p = points.withColumn("__b", b(F.col(point_col)))
    iv = intervals.withColumn(
        "__b", F.explode(F.sequence(b(F.col(start_col)), b(F.col(end_col))))
    )
    conds = [p["__b"] == iv["__b"]]
    conds += [p[k] == iv[k] for k in extra_keys]
    exact = (p[point_col] >= iv[start_col]) & (p[point_col] < iv[end_col])
    return (
        p.join(iv, functools.reduce(operator.and_, conds))
        .where(exact)
        .drop(p["__b"])
        .drop(iv["__b"])
    )
