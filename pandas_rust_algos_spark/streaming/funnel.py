"""Streaming conversion funnel — the stateful-streaming twin of the
batch ``events_funnel`` gate (plans/queries_events.py): per-user
view → click → purchase progression carried as explicit state across
micro-batches via ``applyInPandasWithState``.

State per user is three longs (first view, first qualifying click,
first qualifying purchase, all epoch-µs) — constant-size regardless of
event volume, the property any 100 TB stateful op needs. Each batch's
rows are sorted by event time before the state machine advances, so:

- under a single drain (``availableNow`` over a bounded source, how
  tests and the gate execute) the result is EXACTLY the batch
  semantics (t1 = min view; t2 = min click > t1; t3 = min purchase
  > t2);
- under continuous streaming it is exact for per-user in-order
  delivery and approximate under cross-batch reordering (an
  out-of-order earlier view arriving after a click was already
  accepted cannot retract it) — the standard streaming trade-off,
  which the watermark bounds.

The final step-count rollup (with the 7-day horizon filters) happens
batch-side over the drained per-user states — three rows out.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["FUNNEL_SCHEMA", "funnel_state", "funnel_counts"]

FUNNEL_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("t1", LongType()),
    StructField("t2", LongType()),
    StructField("t3", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("t1", LongType()),
    StructField("t2", LongType()),
    StructField("t3", LongType()),
])

_NONE = -1  # GroupState tuples round-trip None awkwardly; sentinel it


def _update(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    t1, t2, t3 = state.get if state.exists else (_NONE, _NONE, _NONE)
    rows = pd.concat(list(batches), ignore_index=True)
    rows = rows.sort_values("t_us", kind="mergesort")
    for t, et in zip(rows["t_us"].to_numpy(), rows["event_type"].to_numpy()):
        t = int(t)
        if et == "view" and t1 == _NONE:
            t1 = t
        elif et == "click" and t1 != _NONE and t2 == _NONE and t > t1:
            t2 = t
        elif et == "purchase" and t2 != _NONE and t3 == _NONE and t > t2:
            t3 = t
    state.update((t1, t2, t3))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "t1": [None if t1 == _NONE else t1],
        "t2": [None if t2 == _NONE else t2],
        "t3": [None if t3 == _NONE else t3],
    })


def funnel_state(stream: DataFrame) -> DataFrame:
    """Per-user funnel progression over an events stream (update mode:
    one row per active user per micro-batch; keep the latest per key)."""
    return (
        stream.select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def funnel_counts(
    states: DataFrame, *, horizon_us: int = 7 * 24 * 3600 * 1_000_000
) -> DataFrame:
    """Batch-side rollup of drained per-user states to the 3-step
    funnel (same step/step_idx/n_users shape as the batch gate). With
    update-mode emissions, keep each user's LAST state first."""
    spark = states.sparkSession
    latest = states.groupBy("user_id").agg(
        F.max(F.struct("t1", "t2", "t3")).alias("s")
    ).select("user_id", "s.t1", "s.t2", "s.t3")
    in1 = F.col("t1").isNotNull()
    in2 = in1 & F.col("t2").isNotNull() & (
        F.col("t2") - F.col("t1") <= horizon_us
    )
    in3 = in2 & F.col("t3").isNotNull() & (
        F.col("t3") - F.col("t1") <= horizon_us
    )
    counts = latest.agg(
        F.count(F.when(in1, 1)).alias("n1"),
        F.count(F.when(in2, 1)).alias("n2"),
        F.count(F.when(in3, 1)).alias("n3"),
    )
    steps = spark.createDataFrame(
        [("view", 1), ("click", 2), ("purchase", 3)],
        "step string, step_idx long",
    )
    return steps.crossJoin(F.broadcast(counts)).select(
        "step",
        "step_idx",
        F.when(F.col("step_idx") == 1, F.col("n1"))
        .when(F.col("step_idx") == 2, F.col("n2"))
        .otherwise(F.col("n3"))
        .alias("n_users"),
    )
