from pandas_rust_algos_spark.functions.dtypes import (
    UNSIGNED_WIDENING,
    nat_to_null,
    widen_unsigned,
)
from pandas_rust_algos_spark.functions.na import (
    exact_sum,
    fixed_sum,
    na_normalize,
    with_min_count,
)

__all__ = [
    "na_normalize",
    "with_min_count",
    "exact_sum",
    "fixed_sum",
    "UNSIGNED_WIDENING",
    "widen_unsigned",
    "nat_to_null",
]
