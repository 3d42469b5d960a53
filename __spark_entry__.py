"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``pandas_rust_algos_spark.plans.registry`` — the
single source of truth for named queries and their DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from pandas_rust_algos_spark.plans import registry  # noqa: E402

_shipped: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Ship the package source to executors via ``addPyFile``.

    The driver loads this file by path from an arbitrary cwd, so Python
    workers deserializing a pandas-UDF closure defined inside
    ``pandas_rust_algos_spark`` can't rely on the driver's ``sys.path``.
    Zipping the package onto the SparkContext is also exactly how the
    engine deploys to a real multi-executor cluster — SparkFiles puts
    the zip on every worker's import path."""
    key = id(spark.sparkContext)
    if key in _shipped:
        return
    pkg_dir = os.path.join(_REPO_DIR, "pandas_rust_algos_spark")
    zpath = os.path.join(tempfile.gettempdir(), "pandas_rust_algos_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, _REPO_DIR))
    spark.sparkContext.addPyFile(zpath)
    _shipped.add(key)


_SMALL_SF_BYTES = 512 * 1024 * 1024


def _dir_bytes(sf_dir: str) -> int:
    # deliberately NOT memoized: the walk costs microseconds per gate
    # query, and a cached measurement taken while the fixture dir was
    # empty/partially written would misclassify it forever
    total = 0
    try:
        for root, _, files in os.walk(sf_dir):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
    except OSError:
        total = _SMALL_SF_BYTES + 1
    return total


def _tune_for_small_sf(spark: SparkSession, sf_dir: str) -> None:
    """Correctness-gate latency: the driver runs ~120 queries back-to-back
    against the same few-MB fixture dir. Persist the tiny tables once
    (sources.parquet.CACHE_SMALL_TABLES) and drop the initial shuffle
    fan-out — 32 shuffle tasks over 60k rows is pure scheduling overhead,
    and AQE re-expands on real data. Re-evaluated per call: a later query
    in the same session against a LARGE sf_dir resets the flag, drops the
    small-dir caches, and restores the shuffle fan-out, so nothing here
    sticks past the fixture dir that justified it."""
    from pandas_rust_algos_spark.sources import parquet as _pq

    small = _dir_bytes(sf_dir) <= _SMALL_SF_BYTES
    if small == _pq.CACHE_SMALL_TABLES:
        return
    _pq.CACHE_SMALL_TABLES = small
    if not small:
        for df in _pq._TABLE_CACHE.values():
            try:
                df.unpersist()
            except Exception:
                pass
        _pq._TABLE_CACHE.clear()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8" if small else "32")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_rust_algos_spark import cachelife

        # free the PREVIOUS query's tracked caches: a query whose
        # returned plan references a persisted frame cannot unpersist
        # it itself (the caller materializes later), so the next
        # invocation releases — the harness never accumulates more
        # than one query's caches on the shared session
        cachelife.release()
        _ship_package(spark)
        _tune_for_small_sf(spark, sf_dir)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    _ship_package(spark)
    return registry.get("q1_pricing_summary").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: _wrap(fn) for n, fn in registry.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return registry.all_oracles()
