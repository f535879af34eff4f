"""Stateful streaming gap sessionization — the streaming twin of the
batch ``session_window`` query (q28).

Per user, the open session (start, last event, count) lives in state; an
event within ``gap`` extends it, an event beyond ``gap`` closes and emits
the previous session and opens a new one. Successor-closed sessions are
emitted exactly once, deterministically.

Tail sessions close by EVENT-TIME TIMEOUT (the default): each update arms
``setTimeoutTimestamp(last_event + gap)``; when the watermark passes that
instant the session provably cannot be extended (any later event would
start a new session), so the timed-out callback emits it and clears
state. This makes the emitted set equal to batch ``session_window`` once
the watermark advances past every session end — pinned by
tests/test_streaming_multibatch.py with a watermark-advancing sentinel.
``close_tails=False`` keeps the old successor-only behavior (no watermark
required on the input)."""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, n_events long"
)
_STATE_SCHEMA = "start_us long, last_us long, n long"
_OUT_COLS = ["user_id", "session_start_us", "session_end_us", "n_events"]


def _make_sessionizer(gap_us: int, close_tails: bool):
    def close_sessions(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if close_tails and state.hasTimedOut:
            # watermark passed last+gap: the open session is final
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start, last + gap_us, n)], columns=_OUT_COLS
            )
            return

        batch = pd.concat(list(pdfs)).sort_values("ts_us")
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0

        closed = []
        for ts in batch["ts_us"]:
            ts = int(ts)
            if start is None:
                start, last, n = ts, ts, 1
            elif ts - last > gap_us:
                closed.append((user_id, start, last + gap_us, n))
                start, last, n = ts, ts, 1
            else:
                last, n = ts, n + 1
        state.update((start, last, n))
        if close_tails:
            # event-time instant after which this session cannot grow.
            # Clamped to watermark+1: a slow key whose last+gap already
            # trails the stream-wide watermark would otherwise make
            # setTimeoutTimestamp raise INVALID_TIMEOUT_TIMESTAMP; the
            # clamp fires it in the next (possibly no-data) micro-batch,
            # which is correct — rows older than the watermark are
            # filtered before this function, so the session is final.
            state.setTimeoutTimestamp(
                max((last + gap_us) // 1000, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(closed, columns=_OUT_COLS)

    return close_sessions


def _gap_micros(gap: str) -> int:
    n, unit = gap.split()
    per_unit = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
    }
    return int(n) * per_unit[unit] * 1_000_000


def streaming_gap_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    *,
    close_tails: bool = True,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Emit each user session exactly once. Session bounds match batch
    ``session_window``: [first event, last event + gap)."""
    gap_us = _gap_micros(gap)
    if close_tails:
        ticks = events.withWatermark("ts", watermark_delay).select(
            "user_id", "ts", F.unix_micros("ts").alias("ts_us")
        )
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        ticks = events.select("user_id", F.unix_micros("ts").alias("ts_us"))
        timeout = GroupStateTimeout.NoTimeout
    return ticks.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_us, close_tails),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
