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

__all__ = ["salted_agg", "MERGEABLE"]

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
