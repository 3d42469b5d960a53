"""Frequency analysis: heavy hitters (most frequent keys), exact and
approximate.

The reference has no frequency surface (SURVEY §2.3 — no distinct
aggregation at all); this is a driver-brief extension. In a training-
data pipeline heavy hitters drive spam-domain discovery, boilerplate
detection, and skew diagnosis (the keys found here are exactly the keys
that need salting in ``skew_handling``).

Two tiers, same contract as the other approx pairs in this engine:

- exact: groupBy + distributed top-k. The per-key count is a map-side-
  combined hash aggregate (traffic ∝ #distinct keys, not #rows) and the
  top-k is ``TakeOrderedAndProject`` — each partition keeps its own k,
  the driver merges P·k rows. No global sort, no single-partition
  window, at any scale.
- approximate: one pass, bounded memory, no shuffle of raw keys —
  Spark's ``freqItems`` (Karp-Papadimitriou-Shenker misra-gries
  variant). Guarantees a *superset* of every key with frequency >
  support; counts are not returned (follow with one semi-joined exact
  count over the candidate set when counts matter — traffic ∝ |candidates|).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_estimate",
    "cms_sketch",
    "count_by_key",
    "heavy_hitters",
    "heavy_hitters_approx",
    "sql_cms_hash",
]


def _cms_hash(d: int, col, hash_mode: str):
    """Row hash for sketch depth ``d``. ``fast`` = xxhash64 (100 TB
    default). ``portable`` = the engine's md5-prefix→60-bit recipe
    (shared with minhash/simhash portable modes) — byte-identical in
    any engine with md5, which is what lets a SQL oracle replay the
    ENTIRE sketch."""
    if hash_mode == "fast":
        return F.xxhash64(F.lit(d), col)
    if hash_mode == "portable":
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(d)), col)), 1, 15),
            16, 10,
        ).cast("long")
    raise ValueError(f"hash_mode must be fast|portable, got {hash_mode!r}")


def sql_cms_hash(d: int, expr: str) -> str:
    """DuckDB twin of the portable ``_cms_hash``."""
    return (f"CAST('0x' || SUBSTR(md5('{d}' || ':' || {expr}), 1, 15) "
            "AS BIGINT)")


def cms_sketch(
    df: DataFrame,
    key: str,
    *,
    width: int = 256,
    depth: int = 4,
    hash_mode: str = "portable",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005, public) over
    ``df[key]``: returns ``(d, slot, cnt)`` — at most ``depth*width``
    rows REGARDLESS of data size, the classic bounded-memory frequency
    summary. The sketch is mergeable by construction (cell-wise sum),
    so shards/days/streams combine with one more groupBy — the
    100 TB shape: raw keys shuffle only as ``(d, slot)`` pairs that
    map-side-combine into ≤ depth×width rows per task.

    Estimates (``cms_estimate``) never undercount; overcounts are
    collision noise bounded by ~2N/width with probability
    1 - 2^-depth. Unlike Misra-Gries (``heavy_hitters_approx``), the
    sketch is insertion-order-INDEPENDENT — with ``portable`` hashing
    it is bit-deterministic across engines, partitionings, and
    retries, which is what makes it fully SQL-oracle-able."""
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    kstr = F.col(key).cast("string")
    cells = F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(_cms_hash(d, kstr, hash_mode), F.lit(width))
            .cast("int").alias("slot"),
        )
        for d in range(depth)
    ])
    return (
        df.where(F.col(key).isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.slot").alias("slot"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key: str,
    *,
    width: int = 256,
    depth: int = 4,
    hash_mode: str = "portable",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys[key]``: returns
    ``(key, est)`` with ``est = min over d of sketch[d, slot_d(key)]``
    — the count-min estimator. The sketch side is ≤ depth×width rows
    (broadcast-sized by construction); each key probes ``depth``
    cells, so the join traffic is O(|keys|·depth), never O(data)."""
    kstr = F.col(key).cast("string")
    probes = keys.select(
        F.col(key),
        F.explode(F.array(*[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(_cms_hash(d, kstr, hash_mode), F.lit(width))
                .cast("int").alias("slot"),
            )
            for d in range(depth)
        ])).alias("c"),
    ).select(key, F.col("c.d").alias("d"), F.col("c.slot").alias("slot"))
    return (
        probes.join(F.broadcast(sketch), ["d", "slot"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
             .alias("est"))
    )


def count_by_key(df: DataFrame, keys: Sequence[str] | str) -> DataFrame:
    """Per-key occurrence counts (map-side combined)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def heavy_hitters(
    df: DataFrame,
    keys: Sequence[str] | str,
    *,
    k: int = 20,
    min_count: int = 1,
) -> DataFrame:
    """Exact top-``k`` keys by occurrence count (count desc, then keys
    asc — a total order, so the result is deterministic under ties).

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject: a per-
    partition bounded heap + driver merge of P·k candidate rows — the
    scalable distributed top-k (never a global sort of all keys).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    counted = count_by_key(df, keys).where(F.col("cnt") >= min_count)
    order = [F.col("cnt").desc()] + [F.col(c).asc() for c in keys]
    return counted.orderBy(*order).limit(k)


def heavy_hitters_approx(
    df: DataFrame,
    keys: Sequence[str] | str,
    *,
    support: float = 0.01,
) -> DataFrame:
    """Approximate heavy hitters: every key occurring in more than
    ``support`` fraction of rows is returned (possibly with false
    positives — no false negatives), in one pass with O(1/support)
    memory per column and no per-key shuffle.

    This is the 100 TB path: run it first to get a tiny candidate set,
    then exact-count only the candidates. Output: one row per candidate
    key value (exploded from Spark's array-valued ``freqItems`` result).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not 0.0 < support < 1.0:
        raise ValueError(f"support must be in (0, 1), got {support}")
    freq = df.stat.freqItems(keys, support)
    col = f"{keys[0]}_freqItems" if len(keys) == 1 else None
    if col is None:
        raise ValueError("heavy_hitters_approx supports a single key column")
    return freq.select(F.explode(col).alias(keys[0]))


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_pairs: int = 3,
) -> DataFrame:
    """Market-basket co-occurrence with lift — the first (and usually
    only needed) pass of association mining: for every item pair that
    appears together in ≥ ``min_pairs`` baskets, the co-count, the
    per-item basket counts, and ``lift = n_ab·N / (n_a·n_b)``.

    Scale shape: pair generation is ARRAY ALGEBRA after one shuffle —
    baskets aggregate to a sorted distinct item array, and ordered
    pairs come from a nested ``transform``/``slice``/``flatten`` over
    that array (cost ∝ Σ basket_size², bounded by the largest basket,
    typically tens of items). Never the unbounded items⋈items
    self-join a naive SQL formulation runs (the DuckDB oracle DOES run
    that self-join — the point of the gate is that both roads agree).
    The pair count and item counts are map-side-combined aggregates;
    lift is a BIGINT/BIGINT division, engine-identical without
    rounding.
    """
    if min_pairs < 1:
        raise ValueError(f"min_pairs must be >= 1, got {min_pairs}")
    items = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    n_orders = items.select(F.count_distinct("b").alias("n_baskets"))
    arr = items.groupBy("b").agg(F.array_sort(F.collect_set("i")).alias("a"))
    pairs = (
        arr.select(
            F.explode(
                F.flatten(F.transform(
                    "a",
                    lambda x, i: F.transform(
                        F.slice(F.col("a"), i + 2, F.size("a")),
                        lambda y: F.struct(x.alias("pa"), y.alias("pb")),
                    ),
                ))
            ).alias("p")
        )
        .select("p.*")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pairs)
    )
    cnt = items.groupBy("i").agg(F.count(F.lit(1)).alias("c"))
    ca = cnt.select(F.col("i").alias("pa"), F.col("c").alias("n_a"))
    cb = cnt.select(F.col("i").alias("pb"), F.col("c").alias("n_b"))
    return (
        pairs.join(ca, "pa").join(cb, "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa", "pb", "n_ab", "n_a", "n_b",
            ((F.col("n_ab") * F.col("n_baskets")).cast("double")
             / (F.col("n_a") * F.col("n_b"))).alias("lift"),
        )
    )
