"""Dtype mapping: the reference's type system on Spark (SURVEY §1.2).

The reference dispatches over {i8,i16,i32,i64,u8,u16,u32,u64,f32,f64}
(``/root/reference/src/types.rs:4-52``). Spark has no unsigned
integers, so unsigned inputs *widen* to the next signed type that
holds the full range — u64 needs DECIMAL(20,0) (max u64 ≈ 1.8e19 >
max long 9.2e18). Datetimelike i64 (NaT = i64::MIN,
``traits.rs:76-82``) becomes native TimestampType + NULL.

Arrow-side note: pandas/pyarrow *can* hand Spark unsigned arrays
(e.g. a uint32 parquet column); Spark's reader already widens u8/u16/
u32 on read. :func:`widen_unsigned` is for the u64 case and for
making the contract explicit in engine code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["UNSIGNED_WIDENING", "widen_unsigned", "nat_to_null"]

#: reference unsigned dtype → Spark type holding its full range
UNSIGNED_WIDENING = {
    "uint8": "smallint",      # u8  max 255        → i16
    "uint16": "int",          # u16 max 65535      → i32
    "uint32": "bigint",       # u32 max 4.29e9     → i64
    "uint64": "decimal(20,0)",  # u64 max 1.8e19   → needs 20 digits
}


def widen_unsigned(col: Column | str, source_dtype: str) -> Column:
    """Cast a column carrying unsigned-origin values to the Spark type
    that holds the source range (see :data:`UNSIGNED_WIDENING`)."""
    if source_dtype not in UNSIGNED_WIDENING:
        raise ValueError(
            f"{source_dtype!r} is not an unsigned dtype; "
            f"one of {sorted(UNSIGNED_WIDENING)}"
        )
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(UNSIGNED_WIDENING[source_dtype])


def nat_to_null(col: Column | str) -> Column:
    """Datetimelike i64 with the reference's NaT sentinel (i64::MIN,
    ``traits.rs:76-82``) → nullable epoch value: sentinel becomes NULL,
    everything else passes through. Apply before ``timestamp_micros``/
    ``timestamp_millis`` when ingesting reference-convention data."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == F.lit(-(2 ** 63)), F.lit(None)).otherwise(c)
