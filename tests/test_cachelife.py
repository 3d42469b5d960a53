"""Query-scoped cache lifecycle (r12 VERDICT next-#1/#7).

Pins the contract that makes the bench's best-of-N honest: every
``persist()`` a query path takes is either unpersisted inline
(consumed fully inside the query function) or registered with
``cachelife.track`` so the materializing caller can release it — no
``InMemoryRelation`` survives a query invocation, so a repeated
identical invocation recomputes from the parquet inputs instead of
riding the previous run's cache through the CacheManager's
canonicalized-plan match.
"""

from __future__ import annotations

import pytest

from pandas_rust_algos_spark import cachelife
from pandas_rust_algos_spark.plans import registry


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def test_track_release_roundtrip(spark):
    """track() returns the frame unchanged; release() empties the list
    and the session's SQL cache."""
    cachelife.release()  # isolate from whatever earlier tests left
    _cache_manager(spark).clearCache()
    df = spark.range(10).persist()
    assert cachelife.track(df) is df
    assert cachelife.live_count() == 1
    df.count()
    assert not _cache_manager(spark).isEmpty()
    cachelife.release()
    assert cachelife.live_count() == 0
    assert _cache_manager(spark).isEmpty()
    cachelife.release()  # idempotent


@pytest.mark.parametrize("name", [
    "bm25_topk",            # operator-internal persist (tfidf tf)
    "triangle_count",       # 4 persisted graph frames
    "pack_budget_weighted",  # plan-module persist + in-fn collect
    "merge_upsert_read",    # inline try/finally unpersist (no tracking)
    "dsir_weights",         # operator persist + in-fn collect
    "priority_sample_weighted",  # k+1-row TakeOrdered persist
])
def test_no_cache_survives_a_query_invocation(spark, sf_dir, name):
    """After materialize + release, the SQL CacheManager is empty and a
    second invocation produces the identical result from a cold cache."""
    cachelife.release()
    _cache_manager(spark).clearCache()
    fn = registry.get(name).fn

    _force(fn(spark, sf_dir))
    cachelife.release()
    assert _cache_manager(spark).isEmpty(), (
        f"{name} leaked a persisted frame past release()")

    rows1 = sorted(map(tuple, fn(spark, sf_dir).collect()))
    cachelife.release()
    rows2 = sorted(map(tuple, fn(spark, sf_dir).collect()))
    cachelife.release()
    assert rows1 == rows2
    assert _cache_manager(spark).isEmpty()
