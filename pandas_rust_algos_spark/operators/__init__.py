from pandas_rust_algos_spark.operators import (
    datasplit,
    dedup,
    grouped_agg,
    grouped_transform,
    multimodal,
    packing,
    pivot,
    range_join,
    similarity,
    skew_handling,
    take,
    text,
)

__all__ = [
    "grouped_agg",
    "grouped_transform",
    "take",
    "datasplit",
    "dedup",
    "similarity",
    "text",
    "multimodal",
    "packing",
    "skew_handling",
    "range_join",
    "pivot",
]
