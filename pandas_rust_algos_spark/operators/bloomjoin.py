"""Bloom-filter semi-join reduction — shrink a huge probe side BEFORE
the shuffle join.

The classic 100 TB join problem: `fact ⋈ filtered_dim` shuffles the
whole fact table even when only a sliver of it matches the dim. A
Bloom filter built from the dim's keys has NO false negatives, so
filtering the fact side with it first drops provably-unmatchable rows
at the SCAN, and only survivors (matches + a tunable false-positive
trickle) pay the shuffle. Spark's own runtime-row-filter does this
inside the engine for some shapes; this operator makes the reduction
explicit, composable, and plan-visible.

Mechanics (public expressions only — ``bloom_filter_agg`` is not in
the public function registry):

- build: each dim key sets ``n_hashes`` bit positions
  (``pmod(xxhash64(i, key), bits)``); positions group into 64-bit
  words and ONE ``bit_or`` aggregate per word builds the filter —
  map-side combined, shuffle traffic ≤ bits/64 rows.
- the assembled words (``bits/64`` longs — KiB, metadata-sized like
  the ANN centroid table) collect to the driver and ride the probe
  plan as ONE broadcast ROW cross-joined onto the probe side (the
  same pattern as ``similarity.ivf_topk``'s centroid matrix): the
  probe expression references the array COLUMN ``n_hashes`` times, so
  the expression tree stays O(n_hashes) and the filter words travel
  as broadcast data, never as plan text. (An earlier revision inlined
  the 16,384-long array as a plan literal referenced once per hash —
  ~82k literal nodes through analysis/codegen, which made the
  "reducer" 10× dearer than the join it saved. Filters small enough
  to be harmless as plan constants — ≤ ``_WORDS_LITERAL_MAX`` longs —
  still ride as a literal and skip the cross-join.)
- probing is pure codegen arithmetic: ``n_hashes`` shift/index/mask
  ops per row, zero joins beyond the 1-row broadcast, zero state.
- the exact join AFTER the filter removes false positives, so results
  are IDENTICAL to the plain join — the bloom only moves work, never
  changes answers (which is what makes the gate fully oracle-able
  against the plain join).

Key dtypes: ``xxhash64`` is type-sensitive — equal values of int vs
bigint vs string hash DIFFERENTLY, so a dtype mismatch between the
two ``on`` columns would give bloom false NEGATIVES and silently drop
matches. The build therefore casts the dim keys to the probe column's
exact dtype first. For the numeric cases Spark's own join analysis
would satisfy by widening (int fact ⋈ bigint dim), this is lossless
for every value that can actually match (a matching key is by
definition representable on the probe side); non-representable dim
keys can at worst set spurious bits (extra false positives, removed
by the exact join — never a dropped match).

Sizing: false-positive rate ≈ (1 - e^{-kn/m})^k; the default 2^20
bits / 5 hashes holds ~1% at n≈100k keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

__all__ = ["bloom_prefilter_join"]

# Filters at or below this many 64-bit words may ride the plan as an
# array literal; larger ones go as a single broadcast row. 1024 longs
# = 8 KiB of plan text — safely below any codegen/analysis pain.
_WORDS_LITERAL_MAX = 1024


def _positions(key: Column, n_hashes: int, bits: int):
    return [F.pmod(F.xxhash64(F.lit(i), key), F.lit(bits))
            for i in range(n_hashes)]


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    how: str = "inner",
    bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """``big ⋈ small`` on column ``on``, with ``big`` pre-filtered by
    a Bloom filter of ``small``'s keys. Same result set as the plain
    join (no false negatives; the join removes false positives);
    ``how`` supports the match-preserving joins (inner/semi)."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"bloom prefilter preserves matches only; how={how!r} "
            "(outer joins need the unmatched rows the filter drops)")
    probe_dt = big.schema[on].dataType
    build_key = F.col(on)
    if small.schema[on].dataType != probe_dt:
        # xxhash64 is type-sensitive: hash the dim keys exactly as the
        # probe column will be hashed, or equal values never collide.
        # try_cast: a dim key not representable in the probe dtype can
        # never equal a probe value, so NULLing it (which hashes to
        # harmless spurious bits) is safe — and ANSI mode would make a
        # plain cast throw instead.
        build_key = build_key.try_cast(probe_dt)
    n_words = bits // 64
    pos = F.explode(F.array(*_positions(build_key, n_hashes, bits)))
    words = (
        small.select(pos.alias("p"))
        .select((F.col("p") / 64).cast("long").alias("w"),
                F.expr("shiftleft(1L, cast(pmod(p, 64) as int))").alias("b"))
        .groupBy("w").agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    filt = [0] * n_words
    for r in words:
        filt[r["w"]] = r["bits"]

    as_broadcast_row = n_words > _WORDS_LITERAL_MAX
    if as_broadcast_row:
        words_df = big.sparkSession.createDataFrame(
            [(filt,)],
            StructType([StructField("__bloom_words",
                                    ArrayType(LongType()), False)]),
        )
        lit_words = F.col("__bloom_words")
    else:
        lit_words = F.lit(filt)

    def might_contain(key: Column) -> Column:
        checks = []
        for p in _positions(key, n_hashes, bits):
            word = F.element_at(lit_words, (p / 64).cast("int") + 1)
            checks.append(F.getbit(word, p % 64) == 1)
        out = checks[0]
        for c in checks[1:]:
            out = out & c
        return out

    probe = big
    if as_broadcast_row:
        probe = probe.crossJoin(F.broadcast(words_df))
    pruned = probe.where(F.col(on).isNotNull() & might_contain(F.col(on)))
    if as_broadcast_row:
        pruned = pruned.drop("__bloom_words")
    jhow = "left_semi" if how in ("semi", "left_semi", "leftsemi") else how
    return pruned.join(small, on, jhow)
