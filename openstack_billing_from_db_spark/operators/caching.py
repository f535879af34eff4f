"""Tracked persist for operator intermediates.

Operators persist reusable intermediates (signature tables, bucketed
indexes) because both sides of their self-joins read them. A bare
``.persist()`` never paired with ``unpersist()`` accumulates storage
memory across repeated invocations in a long-lived session (bench.py
clears the whole cache; other callers had no handle to release).

``tracked_persist`` registers every such handle; callers that invoke
operators repeatedly release them with ``release_operator_caches()``
after materializing results. Spark's cache manager dedupes identical
plans, so re-persisting the same lineage later is cheap.
"""

from __future__ import annotations

from collections.abc import Callable, Hashable
from typing import Any

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_TRACKED_BC: dict[tuple, Any] = {}


def tracked_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _TRACKED.append(df)
    return df


def cached_broadcast(key: Hashable, factory: Callable[[], Any]):
    """Content-keyed SparkContext broadcast cache. Repeated operator
    builds over the same payload (e.g. a PQ codebook probed once per
    subspace per query build) reuse one JVM-pinned broadcast instead
    of leaking a fresh copy per call; ``release_operator_caches``
    destroys them. Keys are content-derived (hashable), never ``id()``
    — a gc'd object's id can be reused — and are scoped to the active
    SparkContext so a restarted session never sees a stale handle."""
    from pyspark.sql import SparkSession

    sc = SparkSession.getActiveSession().sparkContext
    full_key = (sc.applicationId, key)
    bc = _TRACKED_BC.get(full_key)
    if bc is None:
        bc = sc.broadcast(factory())
        _TRACKED_BC[full_key] = bc
    return bc


def release_operator_caches() -> int:
    """Unpersist every tracked intermediate and destroy every cached
    broadcast; returns how many handles were released. Safe to call
    with queries still unmaterialized (Spark recomputes lineage; a
    destroyed broadcast is rebuilt on the next operator build)."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    while _TRACKED_BC:
        _, bc = _TRACKED_BC.popitem()
        try:
            bc.destroy()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
