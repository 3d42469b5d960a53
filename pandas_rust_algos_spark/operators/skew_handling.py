"""Skew-aware aggregation: salting for pathological hot keys.

AQE's skew-join splitting (enabled in ``session.tune``) handles skewed
*joins* automatically, but a grouped aggregation whose input is
dominated by a handful of whale keys still funnels each whale into one
reducer. Two-phase salted aggregation bounds any single task at
~1/num_salts of the whale:

    phase 1: groupBy(keys + salt) — salt = hash(row) % num_salts,
             partial aggregate per (key, salt) shard;
    phase 2: groupBy(keys) — merge the <= num_salts shard results.

Only aggregates with a merge decomposition qualify (sum/count/min/max/
exact fixed-point sums — the same algebra Spark's own partial
aggregation exploits). For those, Catalyst's map-side combine already
absorbs most skew; explicit salting matters when the *number of groups
is tiny* relative to cores (partial agg produces one row per group per
partition — fine — but the final per-group merge is trivially small, so
the real win is phase-1 shuffle balance on whale keys).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join", "MERGEABLE"]

#: partial-aggregate expression and its merge, per supported op
MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str] | str,
    aggs: dict[str, tuple[str, str]],
    *,
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: out_col -> (op, value_col) with op in :data:`MERGEABLE`.
    The salt is a deterministic spread of rows (hash of all columns
    mod ``num_salts``) — no RNG, so replays/retries land identically.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    for out, (op, _) in aggs.items():
        if op not in MERGEABLE:
            raise ValueError(
                f"{out}: op {op!r} has no merge decomposition; "
                f"supported: {sorted(MERGEABLE)}"
            )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[
            MERGEABLE[op][0](F.col(vc)).alias(out)
            for out, (op, vc) in aggs.items()
        ])
    )
    return phase1.groupBy(*keys).agg(*[
        MERGEABLE[op][1](F.col(out)).alias(out)
        for out, (op, _) in aggs.items()
    ])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str] | str,
    *,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-spread equi-join: the big (probe) side is salted, the small
    (build) side replicated ``num_salts``×, and the join runs on
    ``on + [salt]`` — so a whale key's rows land on ``num_salts``
    reducers instead of one.

    Result set is IDENTICAL to ``big.join(small, on, how)``: every big
    row carries exactly one salt and meets exactly one replica of each
    matching small row (no duplication, no loss), which is what makes
    the gate fully oracle-able against the plain join.

    When to reach for this (100 TB): AQE's skew-join splitting already
    handles a skewed SORT-MERGE join at runtime, and a broadcastable
    small side needs no shuffle at all. Explicit salting covers the
    remaining shape — a hash-partitioned join whose downstream op
    (grouped agg on the same key, stateful stream join) inherits the
    key partitioning and would re-concentrate the whale; the salt keyed
    into the shuffle keeps *both* stages spread. Cost: the small side
    is materialized ``num_salts``× (choose the side accordingly).

    The salt is deterministic (hash of all big-side columns mod
    ``num_salts``, the same convention as :func:`salted_agg`) — no RNG,
    so task retries and speculative duplicates land identically.

    ``how``: inner / left / left_semi / left_anti (joins where each
    OUTPUT row is tied to exactly one big row; right/full would emit
    unmatched small rows once per replica).
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer", "left_semi", "leftsemi",
                   "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti; got "
            f"{how!r} (right/full would repeat unmatched build rows once "
            "per salt replica)")
    missing = [c for c in on_cols if c not in big.columns or c not in small.columns]
    if missing:
        raise ValueError(f"join columns missing on one side: {missing}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                  F.lit(num_salts))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(num_salts)])),
    )
    out = b.join(s, on_cols + ["__salt"], how)
    return out.drop("__salt")
