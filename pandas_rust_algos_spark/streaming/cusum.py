"""Streaming CUSUM — the control chart as a stateful streaming
operator with SIXTEEN BYTES of state per key.

The batch operator (``operators/changepoint.py``) eliminates CUSUM's
recursion via ``s_t = P_t - min_{j≤t} P_j`` (prefix sum minus running
min). That identity is also what makes the STREAMING form trivial to
state: to continue the statistic across micro-batches, a group only
needs the running prefix ``P`` and the running ``min(P)`` — two longs,
regardless of how many events ever flowed. Each batch sorts its rows
by the order column, folds the two accumulators forward with exact
integer arithmetic, and emits the per-row statistic + alarm flag.

Semantics versus batch: under a single drain (``availableNow`` over a
bounded source) the result is EXACTLY the batch operator's — pinned by
the equivalence test. Under continuous streaming it is exact for
per-key in-order delivery and order-approximate across batches (a
straggler appends at its arrival batch's fold position — the standard
stateful-streaming trade; bound disorder with a watermark upstream).

Same fixed-point determinism as batch: micro-unit BIGINTs end-to-end,
so a drained stream, a batch run, and the DuckDB oracle all agree
bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType, LongType, StringType, StructField, StructType,
)

__all__ = ["CUSUM_SCHEMA", "cusum_state"]

_SCALE = 1_000_000

CUSUM_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("event_id", LongType()),
    StructField("cusum_micros", LongType()),
    StructField("alarm", BooleanType()),
])

_STATE_SCHEMA = StructType([
    StructField("prefix", LongType()),
    StructField("min_prefix", LongType()),
])


def cusum_state(
    stream: DataFrame,
    *,
    target: float,
    slack: float,
    threshold: float,
) -> DataFrame:
    """Per-``event_type`` streaming CUSUM over ``(event_id, value)``
    rows, emitting ``CUSUM_SCHEMA`` rows per input event. Input must
    carry ``event_type``, ``event_id``, ``value``."""
    import math

    shift = int(round((target + slack) * _SCALE))
    h = int(round(threshold * _SCALE))

    def update(
        key: tuple,
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        prefix, min_prefix = state.get if state.exists else (0, 0)
        rows = pd.concat(list(batches), ignore_index=True)
        rows = rows.sort_values("event_id")
        out_s, out_a = [], []
        for v in rows["value"]:
            prefix += math.floor(v * _SCALE) - shift
            min_prefix = min(min_prefix, prefix)
            s = prefix - min(0, min_prefix)
            out_s.append(s)
            out_a.append(s > h)
        state.update((int(prefix), int(min_prefix)))
        yield pd.DataFrame({
            "event_type": key[0],
            "event_id": rows["event_id"].to_numpy(),
            "cusum_micros": out_s,
            "alarm": out_a,
        })

    return (
        stream.select("event_type", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=CUSUM_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
