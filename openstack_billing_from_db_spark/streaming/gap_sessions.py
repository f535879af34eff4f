"""Stateful streaming gap sessionization — the streaming twin of the
batch ``session_window`` query (q28).

Per user, the open session (start, last event, count) lives in state;
an event within ``gap`` extends it, an event beyond ``gap`` closes and
emits the previous session and opens a new one. Sessions are therefore
emitted exactly once, deterministically, when their successor arrives;
the final open session per user remains in state (a deployment closes it
via event-time timeout as the watermark passes — best-effort by nature,
so tests pin only the deterministic successor-closed set).
"""

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


def _make_sessionizer(gap_us: int):
    def close_sessions(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
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
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events"],
        )

    return close_sessions


def streaming_gap_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Emit each user session once its successor arrives. Session bounds
    match batch ``session_window``: [first event, last event + gap)."""
    n, unit = gap.split()
    per_unit = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60, "hour": 3600, "hours": 3600}
    gap_us = int(n) * per_unit[unit] * 1_000_000
    ticks = events.select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    return ticks.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_us),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
