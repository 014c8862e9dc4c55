"""Session-scoped registry of persisted helper relations.

Dedup operators persist intermediate relations (signatures, candidate
pairs, band indexes) so multi-consumer subtrees evaluate once. The
registry bounds what a long-lived session accumulates: each new
pipeline invocation — or an explicit release_caches() — unpersists
everything registered before it, so at most one invocation's worth of
cached partitions is ever held. Unpersisting a relation a caller still
references is safe (Spark recomputes lazily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_live_caches: list[DataFrame] = []


def register_cache(df: DataFrame) -> DataFrame:
    _live_caches.append(df)
    return df


def release_caches() -> None:
    """Unpersist cached relations left behind by prior dedup calls."""
    while _live_caches:
        try:
            _live_caches.pop().unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
