"""Greedy sequence packing — batching variable-length documents into
fixed token budgets (context windows) for training.

The canonical LLM-pretraining step after tokenize/chunk: concatenate
documents into ~budget-token packs so no batch slot is wasted on
padding. Optimal bin packing is NP-hard and inherently sequential;
every production pipeline packs *greedily per shard* instead — shards
are independent, so the operation is embarrassingly parallel and scales
linearly with executors. Implemented as ``mapInPandas`` (Arrow batches,
generator state carries the open pack across batch boundaries within a
partition) after an explicit range-repartition + sort, so pack contents
follow a stable document order rather than arbitrary scan order. Pack
ids are ``<shard>-<seq>`` — unique without any cross-shard
coordination (no global counter, no driver round-trip).

This is per-partition imperative logic that genuinely cannot be a
window expression: a pack boundary depends on the running sum *and*
resets it, which is a data-dependent fold, not a frame aggregate.
"""

from __future__ import annotations

from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    count_col: str,
    *,
    budget: int,
    order_col: str | None = None,
    pack_col: str = "pack_id",
    pos_col: str = "pack_pos",
    shard_col: str | None = None,
) -> DataFrame:
    """Assign each row to a pack such that per-pack ``sum(count_col)``
    ≤ ``budget`` (a single row larger than the budget gets a pack of
    its own — flag or truncate upstream). Greedy next-fit in
    ``order_col`` order within each shard; emits ``pack_col``
    (``"<shard>-<seq>"``) and ``pos_col`` (0-based position in pack).

    Two shard modes:

    - ``shard_col=None`` (default): shards are the engine's range
      partitions — zero requirements on the data, but pack membership
      then depends on Spark's sampled partition boundaries (fine when
      any valid packing is acceptable).
    - ``shard_col='...'``: shards are the VALUES of that column
      (hash-co-located; packed independently in ``order_col`` order;
      pack ids are ``"<shard value>-<seq>"``). Membership becomes a
      pure function of the data — stable under retries, cluster
      resizes, and engines, and exactly replayable by a sequential
      oracle (the driver gate proves it row-for-row against a
      recursive-CTE replay of the same greedy fold).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order = order_col or df.columns[0]
    schema = StructType(
        list(df.schema.fields)
        + [StructField(pack_col, StringType(), False),
           StructField(pos_col, IntegerType(), False)]
    )

    if shard_col is None:
        shaped = df.repartitionByRange(F.col(order)) \
            .sortWithinPartitions(order)

        def gen(batches):
            ctx = TaskContext.get()
            shard = ctx.partitionId() if ctx is not None else 0
            pack_idx, fill, pos = 0, 0, 0
            started = False
            for pdf in batches:
                packs, positions = [], []
                for cnt in pdf[count_col].fillna(0).astype(int):
                    if started and fill + cnt > budget:
                        pack_idx += 1
                        fill, pos = 0, 0
                    started = True
                    fill += cnt
                    packs.append(f"{shard}-{pack_idx}")
                    positions.append(pos)
                    pos += 1
                pdf = pdf.copy()
                pdf[pack_col] = packs
                pdf[pos_col] = positions
                yield pdf

        return shaped.mapInPandas(gen, schema)

    # value-sharded: one hash shuffle on the shard key, per-shard runs
    # made contiguous by the sort; state is a dict so a partition that
    # hashes several shard values together still packs each
    # independently (and a shard split across Arrow batches continues
    # where it left off)
    shaped = df.repartition(F.col(shard_col)) \
        .sortWithinPartitions(shard_col, order)

    def gen_sharded(batches):
        state: dict = {}  # shard value -> [pack_idx, fill, pos, started]
        for pdf in batches:
            packs, positions = [], []
            for shard, cnt in zip(pdf[shard_col],
                                  pdf[count_col].fillna(0).astype(int)):
                st = state.setdefault(shard, [0, 0, 0, False])
                pack_idx, fill, pos, started = st
                if started and fill + cnt > budget:
                    pack_idx += 1
                    fill, pos = 0, 0
                fill += int(cnt)
                packs.append(f"{shard}-{pack_idx}")
                positions.append(pos)
                state[shard] = [pack_idx, fill, pos + 1, True]
            pdf = pdf.copy()
            pdf[pack_col] = packs
            pdf[pos_col] = positions
            yield pdf

    return shaped.mapInPandas(gen_sharded, schema)
