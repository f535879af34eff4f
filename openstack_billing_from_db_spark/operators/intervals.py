"""Interval-overlap arithmetic in integer microseconds.

All session math runs on ``unix_micros`` BIGINTs — exact, portable
(DuckDB ``epoch_us`` matches bit-for-bit), and immune to float-summation
order. Seconds/hours are derived at the edges only.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

MICROS_PER_SECOND = 1_000_000
MICROS_PER_HOUR = 3_600_000_000
# stand-in for an open interval's end ("still in this state")
TS_MAX_US = (1 << 62)


def to_micros(t: datetime) -> int:
    """Naive datetimes are UTC (reference treats all times as UTC and
    stamps tzinfo only on output, billing.py:133-134).

    Derived from the calendar fields against the epoch (never
    ``int(t.timestamp())``, which truncates toward zero and is off by one
    second for pre-epoch fractional times)."""
    if t.tzinfo is None:
        t = t.replace(tzinfo=timezone.utc)
    delta = t - datetime(1970, 1, 1, tzinfo=timezone.utc)
    return (delta.days * 86_400 + delta.seconds) * MICROS_PER_SECOND + delta.microseconds


def overlap_micros(
    start_us: Column,
    end_us: Column,
    lo_us: Column | int,
    hi_us: Column | int,
) -> Column:
    """max(0, min(end, hi) - max(start, lo)) — the length of
    ``[start,end) ∩ [lo,hi)``.

    Equivalent to the reference's per-event ``_clamp_time`` into the
    window (model.py:78-88) summed per state: clamping every event time
    into ``[lo,hi]`` and accumulating exit−enter is exactly the sum of
    interval∩window overlaps (SURVEY.md §2.5 equivalence note).
    """
    lo = F.lit(lo_us) if isinstance(lo_us, int) else lo_us
    hi = F.lit(hi_us) if isinstance(hi_us, int) else hi_us
    return F.greatest(F.lit(0).cast("long"), F.least(end_us, hi) - F.greatest(start_us, lo))


def ceil_hours(micros: Column) -> Column:
    """ceil(seconds/3600) as ``(us + 3599999999) div 3600000000`` —
    exact integer arithmetic (reference billing.py:147
    ``math.ceil(runtime_seconds / 3600)``).

    floor of a double division is safe here: runtime micros are bounded
    by the billing window (≪ 2^53), and the fractional remainder
    (≤ (H-1)/H) cannot round up across an integer boundary.
    """
    bumped = micros + F.lit(MICROS_PER_HOUR - 1)
    return F.floor(bumped / F.lit(MICROS_PER_HOUR)).cast("long")
