from pandas_rust_algos_spark.plans.registry import all_queries, all_oracles, get

__all__ = ["all_queries", "all_oracles", "get"]
