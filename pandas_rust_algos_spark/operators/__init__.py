from pandas_rust_algos_spark.operators import (
    grouped_agg,
    grouped_transform,
    take,
)

__all__ = ["grouped_agg", "grouped_transform", "take"]
