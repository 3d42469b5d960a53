"""Shared column combinators: pandas-NA semantics on Spark columns.

The reference threads NA handling through every kernel via per-dtype
sentinels and mask arrays (``/root/reference/src/traits.rs:3-211``,
``groupby.rs:788-843``). In Spark all of that collapses to native NULL
plus these three combinators:

- :func:`na_normalize` — pandas treats float NaN as missing; Spark
  treats NaN as an ordinary double value. Normalizing NaN→NULL at the
  input boundary makes every downstream builtin (sum/avg/min/...) apply
  pandas skipna semantics for free.
- :func:`with_min_count` — the ``check_below_mincount`` finalizer
  (``groupby.rs:788-843``): a group with fewer than ``min_count``
  non-null observations yields NULL.
- :func:`exact_sum` — deterministic double sums. Double addition is not
  associative, so a parallel sum's low bits depend on partitioning; for
  oracle-hash comparison we accumulate in DECIMAL (exact, associative)
  and cast the total back to double. At scale this is also the *correct*
  money-typed aggregation (TPC-H prices are 2-decimal fixed point).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def na_normalize(col: Column | str, *, floating: bool = True) -> Column:
    """Map float NaN to NULL so builtins follow pandas skipna semantics.

    ``floating=False`` (ints/timestamps/strings) is a no-op passthrough:
    ints have no NA in pandas' unmasked model, and the reference's
    int-0-is-NA quirk (``traits.rs:84-90``) is a documented bug we must
    not reproduce (SURVEY §2.4 #6).
    """
    c = F.col(col) if isinstance(col, str) else col
    if not floating:
        return c
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def with_min_count(agg: Column, nonnull_count: Column, min_count: int) -> Column:
    """NULL the aggregate when the group has < min_count non-null obs.

    Mirrors ``check_below_mincount`` (``groupby.rs:788-843``): the check
    is on the count of *observed* (non-null) values, not group size.
    """
    if min_count <= 0:
        return agg
    return F.when(nonnull_count >= F.lit(min_count), agg)


def exact_sum(col: Column | str, scale: int = 6) -> Column:
    """Deterministic SUM: accumulate as DECIMAL(28, scale), return double.

    Decimal addition is exact and associative, so the result is
    independent of partitioning/merge order — required for bit-identical
    comparison against a single-threaded oracle, and exact for
    fixed-point business values. DECIMAL(28,s) leaves 10^(28-s) of
    headroom before overflow; at 100 TB scale widen to DECIMAL(38,s).

    Cost note: sums over precision>18 decimals leave Spark's long-backed
    fast path (JVM BigDecimal per add, ~5× a double sum measured at
    sf0.1) — prefer :func:`fixed_sum` unless group magnitudes can
    exceed its documented headroom.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


def fixed_sum(col: Column | str) -> Column:
    """Deterministic SUM via fixed-point micro-units: floor(x·1e6) as
    long, summed exactly, returned as double units.

    Long addition is exact and associative ⇒ partitioning-independent,
    at the same throughput as a plain double sum (unlike the decimal
    path, which drops to BigDecimal). The quantization to 1e-6 units is
    part of the operator's definition (fixed-point accounting), applied
    identically in the SQL oracles (``registry.dsum``).

    Headroom: a single group's sum must stay under 2^63 micro-units
    ≈ 9.2e12 units. For whale groups beyond that (e.g. global totals
    over 1e11 rows of 1e4-magnitude values), use :func:`exact_sum`
    (decimal(38) headroom) instead — same determinism, slower adds.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.floor(c * F.lit(1e6)).cast("long")).cast("double") / F.lit(1e6)
