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

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_operator_caches() -> int:
    """Unpersist every tracked intermediate; returns how many were
    released. Safe to call with queries still unmaterialized (Spark
    recomputes lineage)."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
