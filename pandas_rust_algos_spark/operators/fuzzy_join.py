"""Fuzzy (edit-distance) self-join: lossless length banding + a
cheap-to-expensive filter cascade per candidate pair.

Finding all string pairs within Levenshtein distance k has no equi-key,
and a naive theta join is a cross join — unusable at scale. Candidate
generation: edit distance ≤ k implies length difference ≤ k, so
bucketing strings by ``floor(len / w)`` with ``w ≥ k`` and exploding
one side to its bucket ±1 yields an equi-join whose candidate set
*provably* contains every true pair (lossless banding, same blueprint
as ``range_join``'s bucket banding).

Banding alone is not enough when lengths cluster (fixed-width prefixes
put EVERY row in one bucket — the sf1 scale rehearsal measured the
resulting pair scan going superlinear), so each candidate pair then
runs a cascade ordered by cost, every stage lossless:

1. exact length filter ``|len_a − len_b| ≤ k`` — two cached ints;
2. character-histogram count filter: one edit moves at most 2 units of
   L1 distance between per-character-class counts, so
   ``L1(hist_a, hist_b) ≤ 2k`` is necessary for distance ≤ k. The
   histogram is 16 hashed character classes in 8-bit lanes packed into
   two longs per ROW (computed once, pre-join); the per-PAIR check is
   16 shift/mask/abs terms — O(1), no allocation. Lanes saturate at
   strings longer than 255 chars, where the filter conservatively
   passes (clamped L1 ≤ true L1 keeps it lossless in every case);
3. ``levenshtein(a, b, threshold=k)`` — Spark's banded O(k·len) DP
   (returns −1 above the threshold), never the full O(len²) matrix.

Each true pair survives the join exactly once: the lower-id row is the
exploded side and the match fires on the single bucket of the other
row — no post-dedup.

Scale notes: pair enumeration within a bucket is still quadratic in
bucket size — the cascade makes each candidate O(1)-cheap, and
discriminating ``extra_keys`` (language, source domain) plus AQE
skew-join keep buckets small. For long strings, run the distance on a
bounded prefix/signature column; full-text near-duplicate detection
belongs to MinHash/SimHash (``operators/dedup.py``), not edit
distance.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_self_join"]

#: strings longer than this overflow the 8-bit histogram lanes; the
#: count filter passes them through to the exact distance instead
_HIST_MAX_LEN = 255


def _char_hist(s: Column) -> Column:
    """Per-row packed character histogram: 16 hashed classes × 8-bit
    lanes across two longs (classes 0–7 → ``h0``, 8–15 → ``h1``).
    The lane weight per class comes from a literal lookup array —
    ``shiftleft`` takes only literal shift amounts."""
    w0 = F.array(*[
        F.lit(1 << (8 * i) if i < 8 else 0).cast("long") for i in range(16)
    ])
    w1 = F.array(*[
        F.lit(1 << (8 * (i - 8)) if i >= 8 else 0).cast("long")
        for i in range(16)
    ])

    def step(acc: Column, ch: Column) -> Column:
        cls = F.pmod(F.ascii(ch), F.lit(16))
        return F.struct(
            (acc["h0"] + F.element_at(w0, cls + 1)).alias("h0"),
            (acc["h1"] + F.element_at(w1, cls + 1)).alias("h1"),
        )

    return F.aggregate(
        F.split(s, ""),
        F.struct(F.lit(0).cast("long").alias("h0"),
                 F.lit(0).cast("long").alias("h1")),
        step,
    )


def _hist_l1(a0: Column, a1: Column, b0: Column, b1: Column) -> Column:
    """Σ lanes |a_lane − b_lane| over both packed longs — SWAR-style
    shift/mask/abs, one codegen expression per pair."""
    terms = []
    for h_a, h_b in ((a0, b0), (a1, b1)):
        for i in range(8):
            la = F.shiftright(h_a, i * 8).bitwiseAND(F.lit(255))
            lb = F.shiftright(h_b, i * 8).bitwiseAND(F.lit(255))
            terms.append(F.abs(la - lb))
    return functools.reduce(operator.add, terms)


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
    ``(id_a, id_b, dist)`` — candidate generation via length banding,
    per-candidate cost via the module-docstring filter cascade.

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
    hist = _char_hist(F.col(str_col))
    left = df.select(
        F.col(id_col).alias("id_a"),
        *[F.col(k).alias(f"__ka_{k}") for k in extra_keys],
        F.col(str_col).alias("__sa"),
        F.length(F.col(str_col)).alias("__la"),
        hist["h0"].alias("__ha0"),
        hist["h1"].alias("__ha1"),
        F.explode(F.array(b - 1, b, b + 1)).alias("__b"),
    )
    right = df.select(
        F.col(id_col).alias("id_b"),
        *[F.col(k).alias(f"__kb_{k}") for k in extra_keys],
        F.col(str_col).alias("__sb"),
        F.length(F.col(str_col)).alias("__lb"),
        hist["h0"].alias("__hb0"),
        hist["h1"].alias("__hb1"),
        b.alias("__b"),
    )
    conds = [left["__b"] == right["__b"], left["id_a"] < right["id_b"]]
    conds += [F.col(f"__ka_{k}") == F.col(f"__kb_{k}") for k in extra_keys]
    len_ok = F.abs(F.col("__la") - F.col("__lb")) <= F.lit(max_dist)
    hist_ok = (
        (F.greatest("__la", "__lb") > F.lit(_HIST_MAX_LEN))
        | (_hist_l1(F.col("__ha0"), F.col("__ha1"),
                    F.col("__hb0"), F.col("__hb1")) <= F.lit(2 * max_dist))
    )
    # banded DP: -1 encodes "above threshold", so a single >= 0 test
    # covers both the cutoff and the (already non-negative) distance
    dist = F.levenshtein("__sa", "__sb", max_dist)
    return (
        left.join(right, functools.reduce(operator.and_, conds))
        .where(len_ok)
        .where(hist_ok)
        .withColumn("dist", dist)
        .where(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )
