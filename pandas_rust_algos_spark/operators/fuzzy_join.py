"""Fuzzy (edit-distance) self-join with lossless length banding.

Finding all string pairs within Levenshtein distance k has no equi-key,
and a naive theta join is a cross join — unusable at scale. But edit
distance ≤ k implies length difference ≤ k, so bucketing strings by
``floor(len / w)`` with ``w ≥ k`` and exploding one side to its bucket
±1 yields an equi-join whose candidate set *provably* contains every
true pair (lossless banding, same blueprint as ``range_join``'s bucket
banding). The exact ``levenshtein() ≤ k`` predicate then runs only on
candidates sharing a bucket (and any exact ``extra_keys``), not on the
cross product.

Each true pair survives the join exactly once: the lower-id row is the
exploded side and the match fires on the single bucket of the other
row — no post-dedup.

Scale notes: length is a skewed band key (real corpora cluster around
common lengths) — pass discriminating ``extra_keys`` (language, source
domain) to shrink buckets, and leave AQE skew-join on for the rest.
For long strings, run the distance on a bounded prefix/signature
column; full-text near-duplicate detection belongs to MinHash/SimHash
(``operators/dedup.py``), not edit distance.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_self_join"]


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    *,
    max_dist: int = 2,
    extra_keys: Sequence[str] = (),
    bucket_width: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with ``levenshtein(str) <= max_dist``
    (and equality on ``extra_keys``), as
    ``(id_a, id_b, dist)`` — candidate generation via length banding.

    ``bucket_width`` defaults to ``max(max_dist, 4)``; any value
    ``>= max_dist`` keeps the banding lossless (length diff ≤ dist ≤ k
    ⇒ bucket diff ≤ 1).
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    w = bucket_width if bucket_width is not None else max(max_dist, 4)
    if w < max(max_dist, 1):
        raise ValueError(
            f"bucket_width ({w}) below max_dist ({max_dist}) would drop "
            "true pairs — the banding is only lossless with width >= max_dist")

    b = F.floor(F.length(F.col(str_col)) / F.lit(w)).cast("long")
    left = df.select(
        F.col(id_col).alias("id_a"),
        *[F.col(k).alias(f"__ka_{k}") for k in extra_keys],
        F.col(str_col).alias("__sa"),
        F.explode(F.array(b - 1, b, b + 1)).alias("__b"),
    )
    right = df.select(
        F.col(id_col).alias("id_b"),
        *[F.col(k).alias(f"__kb_{k}") for k in extra_keys],
        F.col(str_col).alias("__sb"),
        b.alias("__b"),
    )
    conds = [left["__b"] == right["__b"], left["id_a"] < right["id_b"]]
    conds += [F.col(f"__ka_{k}") == F.col(f"__kb_{k}") for k in extra_keys]
    dist = F.levenshtein("__sa", "__sb")
    return (
        left.join(right, functools.reduce(operator.and_, conds))
        .withColumn("dist", dist)
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )
