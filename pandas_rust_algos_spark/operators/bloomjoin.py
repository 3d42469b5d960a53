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
  plan as an array LITERAL, so probing is pure codegen arithmetic:
  ``n_hashes`` shift/index/mask ops per row, zero joins, zero state.
- the exact join AFTER the filter removes false positives, so results
  are IDENTICAL to the plain join — the bloom only moves work, never
  changes answers (which is what makes the gate fully oracle-able
  against the plain join).

Sizing: false-positive rate ≈ (1 - e^{-kn/m})^k; the default 2^20
bits / 5 hashes holds ~1% at n≈100k keys. For dims too large for a
driver literal, raise ``bits`` and swap the literal for the same
single-row broadcast used by ``similarity.ivf_topk`` past its
threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_prefilter_join"]


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
    n_words = bits // 64
    pos = F.explode(F.array(*_positions(F.col(on), n_hashes, bits)))
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

    pruned = big.where(F.col(on).isNotNull() & might_contain(F.col(on)))
    jhow = "left_semi" if how in ("semi", "left_semi", "leftsemi") else how
    return pruned.join(small, on, jhow)
