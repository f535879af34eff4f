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

import threading
from collections import OrderedDict
from collections.abc import Callable, Hashable
from typing import Any

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_TRACKED_BC: OrderedDict[tuple, Any] = OrderedDict()
_BC_LOCK = threading.Lock()

# Upper bound on live cached broadcasts (LRU evict-and-unpersist past it).
# Codebook payloads are kilobytes each, so the cap is about bounding a
# pathological many-distinct-codebooks session, not memory pressure from
# normal use; an evicted broadcast is rebuilt on the next operator build.
BROADCAST_CACHE_MAX = 64


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
    SparkContext so a restarted session never sees a stale handle.

    Bounded and thread-safe (ADVICE r6): a lock serializes get-or-create
    so concurrent builders of the same key share one broadcast instead
    of leaking a racer's copy, and entries beyond
    ``BROADCAST_CACHE_MAX`` are LRU-evicted (unpersisted — executor
    copies drop; a plan still holding the handle lazily
    re-broadcasts). The factory
    runs under the lock — payload construction is driver-side list
    shaping (never a Spark action), so the hold is microseconds."""
    from pyspark.sql import SparkSession

    # getActiveSession() is thread-local (None in a worker thread);
    # fall back to the process-wide default session so concurrent
    # builders resolve the same SparkContext.
    session = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    sc = session.sparkContext
    full_key = (sc.applicationId, key)
    with _BC_LOCK:
        bc = _TRACKED_BC.get(full_key)
        if bc is not None:
            _TRACKED_BC.move_to_end(full_key)
            return bc
        bc = sc.broadcast(factory())
        _TRACKED_BC[full_key] = bc
        while len(_TRACKED_BC) > BROADCAST_CACHE_MAX:
            _, old = _TRACKED_BC.popitem(last=False)
            try:
                # unpersist, NOT destroy: an un-executed plan may still
                # hold the evicted handle — unpersist drops executor
                # copies and lets any such plan lazily re-broadcast,
                # while destroy would make it fail. destroy stays
                # reserved for the explicit release barrier below; an
                # evicted handle leaves _TRACKED_BC, so its FINAL
                # teardown relies on Python GC + Spark's ContextCleaner
                # (acceptable: payloads are kilobyte codebooks).
                old.unpersist(blocking=False)
            except Exception:  # session already stopped — nothing to free
                pass
        return bc


def release_cached_broadcast(key: Hashable) -> bool:
    """Drop ONE cached broadcast by its content key (unpersist, not
    destroy — any still-unexecuted plan holding the handle lazily
    re-broadcasts). For iterative trainers whose payload changes every
    iteration (pq_train's per-iteration codebooks — ADVICE r11): after
    the iteration's aggregate has collected, its broadcast is dead
    weight and waiting for the LRU horizon (or the end-of-query
    release barrier) pins n_iter codebook copies in the JVM. Returns
    whether a broadcast was found and released."""
    from pyspark.sql import SparkSession

    session = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    full_key = (session.sparkContext.applicationId, key)
    with _BC_LOCK:
        bc = _TRACKED_BC.pop(full_key, None)
    if bc is None:
        return False
    try:
        bc.unpersist(blocking=False)
    except Exception:  # session already stopped — nothing to free
        pass
    return True


def release_persisted_caches() -> int:
    """Unpersist every tracked DataFrame intermediate (but keep cached
    broadcasts — destroying a broadcast breaks any still-unexecuted
    plan holding its handle, while unpersisting a DataFrame only ever
    costs a recompute). This is the safe-anytime half of
    :func:`release_operator_caches`; the registry calls it at every
    query-function entry so a sequential 50-query gate session never
    accumulates 50 queries' worth of cached blocks (the round-10 gate
    sim OOMed a bare 1g session on the last head queries without it)."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n


def release_operator_caches() -> int:
    """Unpersist every tracked intermediate and destroy every cached
    broadcast; returns how many handles were released. DataFrame
    unpersists are safe anytime (Spark recomputes lineage); broadcast
    DESTROY is a barrier — call it only once the plans holding the
    handles have been materialized (bench.py's per-query boundary)."""
    n = release_persisted_caches()
    with _BC_LOCK:
        while _TRACKED_BC:
            _, bc = _TRACKED_BC.popitem()
            try:
                bc.destroy()
                n += 1
            except Exception:  # session already stopped — nothing to release
                pass
    return n
