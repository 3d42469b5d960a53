"""Query-scoped cache lifecycle (deferred release).

A ``persist()`` whose cached frame is referenced by the RETURNED lazy
plan cannot ``unpersist()`` inside the query function: Spark substitutes
``InMemoryRelation`` at *action* time (``CacheManager.useCachedData``
runs during query planning), so an early unpersist would disable the
within-invocation reuse that justified the persist. Those sites register
the persisted frame here, and the *materializing caller* releases it
after its action:

- ``bench._force`` releases after every timed run, so run 2 of a
  best-of-3 recomputes from the parquet inputs instead of silently
  reusing run 1's ``InMemoryRelation`` (the CacheManager matches by
  canonicalized plan, so a rebuilt identical DataFrame would otherwise
  ride the previous run's cache), and nothing accumulates across the
  128-query suite on the shared session.
- ``__spark_entry__._wrap`` releases at the START of each query
  invocation, bounding the driver's correctness harness to at most one
  query's caches — without touching the small-fixture table cache
  (``sources.parquet.CACHE_SMALL_TABLES``), which is a separately
  managed, documented, untimed latency device.

Sites whose persisted frame is fully consumed by actions INSIDE the
query function (e.g. a collect or a write) unpersist inline instead
(``try/finally``) and never appear here.

``localCheckpoint`` RDDs are deliberately out of scope: they are
invocation-private (every invocation creates fresh RDD ids, so no
cross-invocation reuse is possible through them), they never enter the
SQL CacheManager, and the ContextCleaner frees them after the Python
references drop.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

_LIVE: list = []


def track(df: "DataFrame") -> "DataFrame":
    """Register an already-``persist()``-ed frame for deferred release.

    Returns the frame unchanged so call sites can stay expression-shaped
    (``track(x.persist())``). Thread-safe enough for the engine's use
    (list.append is atomic under the GIL; release always happens on the
    main thread after the worker threads joined).
    """
    _LIVE.append(df)
    return df


def release() -> None:
    """Unpersist every tracked frame (idempotent, exception-safe).

    ``blocking=False``: removal from the CacheManager — what stops
    cross-invocation plan-match reuse — is synchronous; only the block
    eviction is async.
    """
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass


def live_count() -> int:
    """Number of tracked, not-yet-released frames (test/assert hook)."""
    return len(_LIVE)
