"""Operator-scoped cache lifecycle.

Operators that legitimately persist an intermediate frame (the shingle
frame feeding both the MinHash signature aggregation and the Jaccard
verification join) used to call ``DataFrame.persist()`` directly and
never unpersist: correct inside one query, but a leak across a
long-lived session running many queries — exactly what ``bench.py``
does (36 queries x 2 runs in one JVM) and what a real multi-tenant
driver does. The accumulated MEMORY_AND_DISK entries evict each other
and drag unrelated queries (the r03 bench drift).

The fix is a seam, not a policy change: operators route persists
through :func:`scoped_persist`, which tracks the frame in a
module-level registry; a harness that runs many queries calls
:func:`release_scoped` after each query's action (or wraps it in
:func:`cache_scope`). Correctness never depends on the cache — an
unpersisted frame just recomputes — so releasing early is always safe.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_lock = threading.Lock()
_tracked: list[DataFrame] = []


def scoped_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)``, registered for later :func:`release_scoped`."""
    df = df.persist(level)
    with _lock:
        _tracked.append(df)
    return df


def release_scoped() -> int:
    """Unpersist every frame registered since the last release; returns
    how many were released. Call after the consuming action — blocking=
    False, so this is cheap even mid-session."""
    with _lock:
        frames = _tracked[:]
        _tracked.clear()
    n = 0
    for df in frames:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped; nothing to release
            pass
    return n


@contextmanager
def cache_scope() -> Iterator[None]:
    """Context manager: release all operator-scoped persists on exit."""
    try:
        yield
    finally:
        release_scoped()
