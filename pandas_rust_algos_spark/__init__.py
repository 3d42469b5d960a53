"""pandas_rust_algos_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference kernel library ``WillAyd/pandas_rust_algos`` (pandas'
groupby/algos kernels re-implemented in Rust), re-expressed Spark-first:

- every reference kernel (``group_sum`` .. ``group_rank``, ``take_1d``;
  see ``/root/reference/src/lib.rs`` bindings) becomes a declarative
  DataFrame transformation so Catalyst/Tungsten pick the physical plan;
- NA semantics follow *intended pandas semantics* (native Spark NULL ==
  pandas NA; NaN in float columns is normalized to NULL), not the
  reference's sentinel quirks (``traits.rs:84-90`` treats int 0 as NA —
  a documented reference bug we do not reproduce);
- beyond the reference surface: relational/TPC-H-style queries, dedup,
  similarity search, text analysis, multimodal plumbing and streaming —
  all partition-parallel, no driver-side loops, built for 100 TB.

Layout:
    session.py    SparkSession factory + runtime tuning
    sources/      parquet loaders for the fixture star schema
    functions/    shared column combinators (min_count, NaN→NULL, ...)
    operators/    the operator library (grouped agg/transform, take,
                  relational, dedup, similarity, text, multimodal)
    plans/        named query registry: queries() + DuckDB oracle SQL
    streaming/    Structured Streaming ops over the events table
"""

from pandas_rust_algos_spark.api import GroupBy, groupby
from pandas_rust_algos_spark.session import get_spark, tune

__all__ = ["get_spark", "tune", "groupby", "GroupBy"]
__version__ = "0.1.0"
