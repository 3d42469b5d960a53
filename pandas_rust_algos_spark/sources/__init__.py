from pandas_rust_algos_spark.sources.parquet import (
    TABLES,
    load_table,
    load_tables,
    spread,
)

__all__ = ["TABLES", "load_table", "load_tables", "spread"]
