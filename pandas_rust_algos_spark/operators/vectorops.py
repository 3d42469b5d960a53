"""Embedding-column vector transforms: L2 normalization and int8
quantization — storage/serving primitives for a training-data pipeline
(driver-brief extension; the reference has no vector surface,
SURVEY §2.3).

Int8 quantization is the standard 4× shrink for embedding stores and
ANN indexes: per-vector absmax scaling, ``q = round(x·127/absmax)``,
dequantize with ``q·absmax/127``. Everything here is a narrow per-row
higher-order-function expression — no shuffle, no Python — so at
100 TB it runs at scan speed and composes with the write path
(`sources/sinks.py`) for a quantized copy of the corpus.

Determinism: the rounding is expressed as ``floor(x + 0.5)`` (not an
engine ``round()``, whose half-way tie rule differs across engines) so
an oracle evaluating the same expression tree gets bit-identical
results (registry determinism rules 2-3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators.similarity import _as_double, dot

__all__ = ["l2_normalize", "quantize_int8", "dequantize_int8"]


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", *, out_col: str = "unit"
) -> DataFrame:
    """Unit-norm copy of the vector column (zero vectors → NULL, never
    a division by zero). Narrow, JVM-side, codegen."""
    v = _as_double(F.col(vec_col))
    n = F.sqrt(dot(v, v))
    unit = F.when(
        n > 0, F.transform(v, lambda x: x / n)
    )
    return df.withColumn(out_col, unit)


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    q_col: str = "q",
    scale_col: str = "absmax",
) -> DataFrame:
    """Per-vector absmax int8 quantization: appends the absmax scale
    and the quantized ``array<int>`` (values in [-127, 127]).

    ``q = floor(x·127/absmax + 0.5)`` — all-zero vectors quantize to
    zeros with absmax 0 (guarded divide). Narrow per-row expression;
    the 4× size cut is what makes a 100 TB embedding store fit the ANN
    serving tier."""
    v = _as_double(F.col(vec_col))
    absmax = F.array_max(F.transform(v, F.abs))
    safe = F.when(absmax > 0, absmax)
    q = F.transform(
        v,
        lambda x: F.coalesce(
            F.floor(x * 127.0 / safe + 0.5), F.lit(0)
        ).cast("int"),
    )
    return df.withColumn(scale_col, absmax).withColumn(q_col, q)


def dequantize_int8(
    df: DataFrame,
    q_col: str = "q",
    scale_col: str = "absmax",
    *,
    out_col: str = "deq",
) -> DataFrame:
    """Inverse transform: ``x ≈ q·absmax/127`` (max error absmax/254
    per element)."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(q_col), lambda x: x.cast("double") * F.col(scale_col) / 127.0
        ),
    )
