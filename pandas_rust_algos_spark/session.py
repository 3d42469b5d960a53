"""SparkSession factory and runtime tuning.

Design notes (100 TB target):

- ``spark.sql.adaptive.enabled`` — AQE re-plans at runtime: coalesces
  small shuffle partitions, converts sort-merge joins to broadcast when
  the built side turns out small, and splits skewed partitions
  (``skewJoin``). On a 1000-executor cluster this is the single most
  important knob; we turn it on everywhere.
- ``spark.sql.shuffle.partitions`` — sized from local parallelism for
  the test harness; on a real cluster this should be ~2-3× total cores
  and AQE coalescing handles the rest.
- Arrow execution — every pandas-UDF boundary moves columnar Arrow
  batches, never pickled rows.

The driver owns the session in ``__spark_entry__``; therefore all knobs
we rely on must be *runtime-settable* (``spark.conf.set``) and applied
idempotently via :func:`tune` at query entry, not only at build time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: conf applied both at session build and (runtime-settable subset) per query.
_RUNTIME_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # deterministic timestamp semantics for oracle comparison
    "spark.sql.session.timeZone": "UTC",
    # 10 MB default is conservative; fixture dims (region/nation/...) are
    # tiny and even at 100 TB the dimension tables stay broadcastable.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an existing session (idempotent).

    Safe to call at the top of every query function: all keys here are
    runtime-settable, so this works on the driver-owned session too.
    """
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # non-settable in this deployment — keep going; every knob
            # here is an optimization, not a correctness requirement.
            pass
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(_cpus()))
    except Exception:
        pass
    return spark


def local_df(spark: SparkSession, rows, schema: str):
    """Driver-built tiny DataFrame (centroids, codebooks, sketch words
    — metadata-sized by construction) via the pandas/Arrow path.

    The plain-list ``createDataFrame`` parallelizes over default
    parallelism, and a later ``coalesce(1)`` of that parallelized
    collection stalls ~6 s per action in local mode (measured: the
    cost scales as 1/n_out — 6 s at coalesce(1), 1 s at coalesce(8) —
    independent of ``spark.locality.wait``; parquet-backed and
    pandas-backed frames don't exhibit it). The pandas path yields a
    LocalTableScan whose coalesce(1) write is ~0.3 s, so every tiny
    persisted artifact (one file on disk is the right layout for a
    KiB table) should be built through here."""
    import pandas as pd
    from pyspark.sql.types import StructType

    names = StructType.fromDDL(schema).fieldNames()
    pdf = pd.DataFrame(list(rows), columns=names)
    return spark.createDataFrame(pdf, schema)


def get_spark(app_name: str = "pandas_rust_algos_spark") -> SparkSession:
    """Build (or reuse) a local SparkSession sized from SPARK_GRAFT_CPUS."""
    cpus = _cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Single-JVM harness: every task is process-local by
        # construction, so the scheduler's delay-scheduling wait
        # (default 3s/level) is pure stall — measured 6s on EVERY
        # coalesce(1) of a driver-built table (2 locality levels),
        # e.g. each tiny centroid/books write. Build-time-only conf.
        # On a real multi-node cluster keep the default (or tune):
        # there the wait buys HDFS block locality on big scans.
        .config("spark.locality.wait", "0s")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return tune(spark)
