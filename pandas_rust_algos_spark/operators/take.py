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
    df: DataFrame,
    order: Sequence[str] | str,
    *,
    pos_col: str = "pos",
    scalable: bool = True,
) -> DataFrame:
    """Attach a dense 0-based position column defined by a total order.

    ``scalable=True`` (default) is the distributed numbering:
    range-partition on the order columns (each partition then holds a
    contiguous key range), number rows *within* each partition, and add
    per-partition offsets computed from a tiny partition-counts
    aggregate joined back by broadcast. Every step is partition-
    parallel; nothing funnels through one task.

    ``scalable=False`` is the textbook global ``row_number()`` over an
    un-partitioned window — simpler plan, but Spark moves every row
    into a single task for the window, which caps at ~10^8 rows;
    equality of the two paths is unit-tested.
    """
    order = [order] if isinstance(order, str) else list(order)
    ocols = [F.col(o) for o in order]
    if not scalable:
        w = Window.orderBy(*ocols)
        return df.withColumn(pos_col, F.row_number().over(w) - 1)

    part = df.repartitionByRange(*ocols).withColumn(
        "__pid", F.spark_partition_id()
    )
    # per-partition row number (local sort only — the range partitioner
    # already made partitions globally ordered)
    wlocal = Window.partitionBy("__pid").orderBy(*ocols)
    part = part.withColumn("__rn", F.row_number().over(wlocal))
    # cumulative offset of each partition: tiny (one row per partition),
    # so the global-window cumsum over it is cheap, and the join back is
    # a broadcast — no second shuffle of the data
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    offsets = counts.withColumn(
        "__off", F.sum("__n").over(Window.orderBy("__pid")) - F.col("__n")
    ).select("__pid", "__off")
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(pos_col, (F.col("__rn") + F.col("__off") - 1).cast("long"))
        .drop("__pid", "__rn", "__off")
    )


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
