"""CUSUM changepoint / drift-onset detection as pure window algebra.

The one-sided CUSUM statistic is defined recursively —
``s_t = max(0, s_{t-1} + (x_t - target - slack))`` — which looks like
it demands per-group sequential Python (``applyInPandas``). It does
not: with ``delta_t = x_t - target - slack`` and prefix sums
``P_t = Σ_{i≤t} delta_i`` (``P_0 = 0``), the recursion has the closed
form

    s_t = P_t - min_{0 ≤ j ≤ t} P_j

so CUSUM is a cumulative SUM followed by a running MIN over that sum —
two stacked window projections on the SAME partition+order (one
shuffle; the second layer reuses the first's sort), all whole-stage-
codegen JVM expressions. This identity is what makes the operator
distributable: no state carried between rows by Python, no iteration,
and (with deltas in fixed-point micro-units) every value is an exact
BIGINT, so the statistic is bit-identical across engines and
partitionings — fully oracle-checkable, which a float recursion never
is.

The symmetric (downward) statistic is the same form with
``delta_t = target - slack - x_t``; compose two calls.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["cusum"]

_SCALE = 1_000_000


def cusum(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    target: float,
    slack: float,
    threshold: float,
    out_col: str = "cusum_micros",
    alarm_col: str = "alarm",
) -> DataFrame:
    """Append the upward CUSUM statistic (micro-unit BIGINT) and the
    ``s > threshold`` alarm flag, per ``group_cols`` group in
    ``order_cols`` order (make it a TOTAL order — ties would make the
    prefix sums order-dependent).

    ``target`` is the in-control mean, ``slack`` the half-band k (drift
    smaller than ``slack`` per observation never alarms), ``threshold``
    the alarm level h — the standard (k, h) CUSUM parameterization.
    """
    shift = int(round((target + slack) * _SCALE))
    delta = (
        F.floor(F.col(value_col) * F.lit(float(_SCALE))).cast("long")
        - F.lit(shift)
    )
    w = (
        Window.partitionBy(*group_cols).orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = df.select("*", F.sum(delta).over(w).alias("__prefix"))
    s = F.col("__prefix") - F.least(
        F.lit(0).cast("long"), F.min("__prefix").over(w)
    )
    return (
        staged.select(
            "*",
            s.alias(out_col),
            (s > F.lit(int(round(threshold * _SCALE)))).alias(alarm_col),
        )
        .drop("__prefix")
    )
