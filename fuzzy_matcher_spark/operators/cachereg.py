"""Per-thread registry of persisted helper relations.

Dedup operators persist intermediate relations (signatures, candidate
pairs, band indexes) so multi-consumer subtrees evaluate once. The
registry bounds what a long-lived session accumulates: each new
pipeline invocation — or an explicit release_caches() — unpersists
everything the CALLING THREAD registered before it, so at most one
invocation's worth of cached partitions per thread is ever held.
Unpersisting a relation a caller still references is safe (Spark
recomputes lazily).

The registry is THREAD-LOCAL: two pipelines running concurrently on
one SparkSession (each from its own thread, the supported concurrency
model — Spark itself scopes job groups the same way) never release
each other's relations mid-job. Without this, invocation B's opening
release_caches() would unpersist invocation A's persisted+counted
``pairs`` relation, silently discarding the exact-stats protection
that keeps AQE from broadcasting the wide verification side (the
measured driver-OOM mode). The trade: caches registered by a thread
that exits without a follow-up call stay resident until the session
ends or the session-level Catalog.clearCache() runs — acceptable for
job-per-thread usage, and strictly safer than cross-thread frees.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_local = threading.local()


def _caches() -> list[DataFrame]:
    if not hasattr(_local, "caches"):
        _local.caches = []
    return _local.caches


def register_cache(df: DataFrame) -> DataFrame:
    _caches().append(df)
    return df


def release_caches() -> None:
    """Unpersist cached relations left behind by THIS THREAD's prior
    dedup calls."""
    caches = _caches()
    while caches:
        try:
            caches.pop().unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
