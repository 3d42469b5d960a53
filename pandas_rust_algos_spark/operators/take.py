"""take/gather — positional indexing as order-preserving joins.

Mirrors ``take_1d`` (``/root/reference/src/lib.rs:37-168``) and
``take_2d_axis1`` / ``take_2d_unsafe``
(``lib.rs:170-209``, ``algos.rs:48-62``).

The reference's gather is the kernel pandas uses to materialize
reindex/join results: ``out[i] = values[indexer[i]]`` with ``-1`` →
fill. Distributed, "position" must be an explicit column, and the
gather is an equi-join of the indexer against row-numbered values —
Catalyst picks broadcast vs shuffle join by size (AQE re-plans at
runtime), which is exactly the right physical strategy at 100 TB:
a small indexer broadcasts; two big sides hash-partition on position.

Fixes vs reference: the fill value is a real parameter (the reference
hardcodes 0 and ignores it, ``README.md:28-30``; SURVEY §2.4 #7), and
dtype widening (``lib.rs:64-165``'s match matrix) is a ``cast``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["with_position", "take_1d", "take_columns"]


def with_position(
    df: DataFrame, order: Sequence[str] | str, *, pos_col: str = "pos"
) -> DataFrame:
    """Attach a 0-based position column defined by a total order.

    A global ``row_number`` over an un-partitioned window serializes
    through one task; for the gather semantics we only need a *stable,
    dense* numbering, so at scale prefer ``zipWithIndex``-style
    numbering: per-partition ``row_number`` + cumulative partition
    offsets. Implemented here with the window over ``order`` for exact
    reference parity (positions == sort order), which is fine up to
    ~10^8 rows; swap in the offset variant for larger inputs.
    """
    order = [order] if isinstance(order, str) else list(order)
    w = Window.orderBy(*[F.col(o) for o in order])
    return df.withColumn(pos_col, F.row_number().over(w) - 1)


def take_1d(
    values: DataFrame,
    value_col: str,
    indexer: DataFrame,
    idx_col: str,
    *,
    pos_col: str = "pos",
    out_col: str | None = None,
    fill_value=None,
    cast: str | None = None,
) -> DataFrame:
    """``out[i] = values[indexer[i]]`` with NULL/-1 → ``fill_value``.

    ``values`` must carry ``pos_col`` (see :func:`with_position`).
    ``indexer`` rows with NULL or negative ``idx_col`` produce the fill
    value (reference's ``-1`` convention, ``lib.rs:47-55``); ``cast``
    applies the reference's dtype-widening (e.g. ``'double'`` for
    i8→f64).
    """
    out_col = out_col or value_col
    idx = F.when(F.col(idx_col) >= 0, F.col(idx_col)).cast("long")
    ind = indexer.withColumn("__take_idx", idx)
    vals = values.select(
        F.col(pos_col).alias("__take_pos"), F.col(value_col).alias("__take_val")
    )
    joined = ind.join(
        vals, ind["__take_idx"] == vals["__take_pos"], "left"
    ).drop("__take_idx", "__take_pos")
    gathered = F.col("__take_val")
    if cast:
        gathered = gathered.cast(cast)
    if fill_value is not None:
        fill = F.lit(fill_value).cast(cast) if cast else F.lit(fill_value)
        gathered = F.coalesce(gathered, fill)
    return joined.withColumn(out_col, gathered).drop("__take_val")


def take_columns(df: DataFrame, indices: Sequence[int]) -> DataFrame:
    """``take_2d_axis1``: project columns by position
    (``algos.rs:48-62``) — a pure SELECT list; Spark's implicit task
    parallelism subsumes the rayon variant (``take_2d_unsafe``)."""
    cols = df.columns
    return df.select(*[cols[i] for i in indices])
