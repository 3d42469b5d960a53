"""General as-of join (pandas ``merge_asof``): backward / forward /
nearest, tolerance, exact-match control.

Spark has no native as-of join. The naive form — equi-join on the by-
key, filter the time predicate, argmax per left row — explodes on hot
keys (every left row × every right row for the key) before collapsing.
The scalable pattern used here is the **union-sort trick**: tag both
inputs, union them, ONE shuffle+sort on (by, time, side), then a
running last-non-null of the right-side payload gives every left row
its latest preceding right row in O(n log n) with no intermediate
explosion. Forward is the same scan with time reversed; nearest runs
both directions over the same partitioning and picks per-row by
absolute distance.

Determinism: rows tied on (by, time, side) carry identical payloads
only if the right side is unique per (by, time) — callers should
pre-dedup the right side (as pandas requires sorted, and effectively
last-wins on duplicates); ties between a left and right row at the
same time are governed by ``allow_exact``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["merge_asof"]


def _ord_expr(dtypes: dict[str, str], col: str) -> Column:
    c = F.col(col)
    if dtypes[col].startswith("timestamp"):
        return F.unix_micros(c.cast("timestamp"))
    return c.cast("long") if dtypes[col] in ("int", "smallint", "tinyint") else c


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: Sequence[str] | str,
    right_cols: Sequence[str],
    direction: str = "backward",
    tolerance: int | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """pandas ``merge_asof``: attach ``right_cols`` of the closest
    right row (per ``direction``) to every left row, matching within
    ``by`` groups on the ``on`` column.

    ``tolerance`` is in the ``on`` column's native units (microseconds
    for timestamps); matches farther than it yield NULL payloads, like
    pandas. ``nearest`` breaks exact ties toward the backward match.
    Left rows and columns are preserved exactly (left join semantics).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward|forward|nearest")
    if tolerance is not None and tolerance < 0:
        raise ValueError("tolerance must be non-negative")
    by = [by] if isinstance(by, str) else list(by)
    right_cols = list(right_cols)
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    sentinels = {"__rt", "__r", "__t", "__side"} & (set(right_cols) | set(by))
    if sentinels:
        raise ValueError(
            f"column names reserved by merge_asof internals: {sorted(sentinels)}"
        )

    lt, rt = dict(left.dtypes), dict(right.dtypes)
    left_payload = [c for c in left.columns if c not in by]
    rside = 0 if allow_exact_matches else 2
    # the matched-time column rides in the order expression's own type
    ord_type = (
        "long"
        if rt[on].startswith("timestamp") or rt[on] in ("int", "smallint", "tinyint")
        else rt[on]
    )
    # The whole right payload travels as ONE struct so the running
    # last(ignorenulls=True) is row-coherent: a matched right row whose
    # payload value is legitimately NULL keeps that NULL (the struct
    # itself is non-null), instead of each column independently falling
    # back to a stale earlier right row. __rt rides inside the same
    # struct for the same reason — the tolerance check must see the
    # matched row's own time.
    struct_type = (
        "struct<"
        + ",".join(
            [f"`{c}`:{rt[c]}" for c in right_cols] + [f"`__rt`:{ord_type}"]
        )
        + ">"
    )

    lrows = left.select(
        *by,
        _ord_expr(lt, on).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(struct_type).alias("__r"),
    )
    rrows = right.select(
        *by,
        _ord_expr(rt, on).alias("__t"),
        F.lit(rside).alias("__side"),
        *[F.lit(None).cast(lt[c]).alias(c) for c in left_payload],
        F.struct(
            *[F.col(c).alias(c) for c in right_cols],
            _ord_expr(rt, on).alias("__rt"),
        )
        .cast(struct_type)
        .alias("__r"),
    )
    u = rrows.unionByName(lrows)

    def scan(ascending: bool) -> Column:
        order = [F.col("__t").asc() if ascending else F.col("__t").desc(),
                 F.col("__side").asc()]
        w = (Window.partitionBy(*by).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return F.last("__r", ignorenulls=True).over(w)

    def within_tol(r: Column) -> Column:
        """NULL out a candidate match farther than tolerance. For
        nearest this runs per direction BEFORE the pick, matching
        pandas: a closer-but-out-of-tolerance side must not shadow the
        farther-but-within side."""
        if tolerance is None:
            return r
        return F.when(
            F.abs(F.col("__t") - r.getField("__rt")) <= F.lit(tolerance), r
        )

    if direction in ("backward", "forward"):
        matched_r = within_tol(scan(ascending=direction == "backward"))
    else:
        bwd = within_tol(scan(ascending=True))
        fwd = within_tol(scan(ascending=False))
        use_bwd = (
            fwd.isNull()
            | (bwd.isNotNull()
               & ((F.col("__t") - bwd.getField("__rt"))
                  <= (fwd.getField("__rt") - F.col("__t"))))
        )
        matched_r = F.when(use_bwd, bwd).otherwise(fwd)

    out = u.select(
        *by, "__t", "__side", *left_payload, matched_r.alias("__r")
    ).where(F.col("__side") == 1)
    return out.select(
        *by,
        *left_payload,
        *[F.col("__r").getField(c).alias(c) for c in right_cols],
    )
