"""Event-log sessionization: the reference's VM state machine as one
window pass + one aggregation.

The reference (model.py:90-156) walks each instance's ordered events in
Python, mutating five ``State`` accumulators with per-event time clamping
into the query window. That is O(events) driver-side work per instance
per window — and it is re-run from scratch for every outage interval
(billing.py:95-100).

Here the same semantics are three declarative steps, each distributed:

1. ``map_event_states``   — action/message → state (a CASE expression;
   reference trigger table model.py:141-150, Error path model.py:100-107).
2. ``build_state_intervals`` — lag/lead over (id, ts): each trigger event
   opens a state interval ``[ts, next_trigger_ts)``; the last interval is
   open-ended. Window-independent, so intervals are computed ONCE and
   reused for every billing window and every outage interval.
3. ``state_micros_in_window`` — clamped-overlap aggregation: per id,
   Σ |interval ∩ window| − Σ_o |interval ∩ outage_o| per state.

Equivalences (SURVEY.md §2.5, pinned by tests/test_sessionize_golden.py):

- Per-event clamping into [start,end] + exit−enter accumulation
  ≡ Σ interval∩window overlap.
- Duplicate same-state triggers are ignored by the reference
  (model.py:109-117) — a no-op on summed durations, so intervals need
  no consecutive-duplicate collapse.
- Error re-entering Error (model.py:101-107) splits an interval without
  changing its sum.
- Replaying the machine over an outage interval (billing.py:95-100)
  ≡ Σ interval∩outage overlap — the outage bounds are NOT clamped to the
  billing window, reproducing the reference's over-subtraction when an
  outage extends past the window.

Scale notes (100 TB): one shuffle to hash-partition events by id for the
lead() window; the per-id aggregation reuses that partitioning (Catalyst
sees hashpartitioning(id) already satisfies the groupBy distribution), so
the whole operator is a single exchange. Outage exclusion is literal
column arithmetic — zero joins. Skewed ids (an instance with millions of
events) are the one hazard; AQE skew handling does not apply to window
functions, so extremely hot ids use ``build_state_intervals_bucketed``:
two passes with bounded per-(id, time-bucket) sorts, boundaries stitched
via tiny per-bucket summaries — identical output, test-pinned.

Known deviations from the reference (documented, SURVEY.md §2.11 #4):
- zero-event instances and deleted_at-without-events yield zero runtime
  (the reference crashes on ``None.exit``, model.py:124,127);
- a ``deleted_at`` earlier than the last event sorts into timestamp order
  (the reference appends it after all events, accumulating negative time).
"""

from __future__ import annotations

from datetime import datetime
from typing import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.operators.intervals import (
    TS_MAX_US,
    overlap_micros,
    to_micros,
)

# reference model.py:141-150
DEFAULT_TRIGGER_STATES: Mapping[str, str] = {
    "create": "Running",
    "start": "Running",
    "unshelve": "Running",
    "stop": "Stopped",
    "shelve": "Shelved",
    "delete": "Deleted",
}

BILLED_STATES: tuple[str, ...] = ("Running", "Stopped")  # reference model.py:152-156


def map_event_states(
    events: DataFrame,
    *,
    id_col: str = "instance_uuid",
    ts_col: str = "created_at",
    action_col: str = "action",
    message_col: str | None = "message",
    trigger_states: Mapping[str, str] = DEFAULT_TRIGGER_STATES,
    error_message: str = "Error",
) -> DataFrame:
    """action/message → ``state``; non-trigger events are dropped.

    Error detection is message-based and takes precedence over the action
    (reference model.py:100-107: any event whose message is "Error" enters
    the Error state regardless of its action).
    """
    state: Column = F.lit(None).cast("string")
    # build the CASE from the trigger table; Error checked first
    expr = None
    if message_col is not None:
        expr = F.when(F.col(message_col) == error_message, F.lit("Error"))
    for action, st in trigger_states.items():
        cond = F.col(action_col) == action
        expr = F.when(cond, F.lit(st)) if expr is None else expr.when(cond, F.lit(st))
    state = expr.otherwise(F.lit(None))
    return (
        events.withColumn("state", state)
        .filter(F.col("state").isNotNull())
        .select(
            F.col(id_col).alias("instance_uuid"),
            F.col(ts_col).alias("event_ts"),
            F.col("state"),
        )
    )


def with_synthetic_deletes(
    states: DataFrame,
    instances: DataFrame,
    *,
    id_col: str = "uuid",
    deleted_at_col: str = "deleted_at",
) -> DataFrame:
    """Append a synthetic Deleted transition at ``deleted_at`` (reference
    model.py:119-125). ``__order`` makes the synthetic event sort after a
    real event at the same timestamp, matching the reference's
    process-events-then-apply-deleted_at order."""
    synthetic = (
        instances.filter(F.col(deleted_at_col).isNotNull())
        .select(
            F.col(id_col).alias("instance_uuid"),
            F.col(deleted_at_col).alias("event_ts"),
            F.lit("Deleted").alias("state"),
            F.lit(1).alias("__order"),
        )
    )
    return states.withColumn("__order", F.lit(0)).unionByName(synthetic)


def build_state_intervals(states: DataFrame) -> DataFrame:
    """Ordered trigger events → state intervals via lead().

    Output: (instance_uuid, state, start_us, end_us); the last interval
    per id is open (end_us = TS_MAX_US) — the reference closes it at each
    query window's end (model.py:127), which the overlap clamp reproduces
    for any window.
    """
    order_cols = [F.col("event_ts")]
    if "__order" in states.columns:
        order_cols.append(F.col("__order"))
    w = Window.partitionBy("instance_uuid").orderBy(*order_cols)
    return states.select(
        "instance_uuid",
        "state",
        F.unix_micros(F.col("event_ts")).alias("start_us"),
        F.coalesce(
            F.unix_micros(F.lead("event_ts").over(w)), F.lit(TS_MAX_US)
        ).alias("end_us"),
    )


def build_state_intervals_bucketed(
    states: DataFrame, *, bucket: str = "month"
) -> DataFrame:
    """Skew-resistant variant of :func:`build_state_intervals` for hot
    instances (an id with tens of millions of events would bottleneck the
    single per-id window sort).

    Two passes:
    1. window over (id, time-bucket): intervals within each bucket — the
       per-partition sort is bounded by bucket size, so a hot id spreads
       across buckets instead of landing in one task;
    2. window over per-(id, bucket) summary rows (tiny: one row per
       non-empty bucket) to stitch bucket boundaries — each bucket's open
       tail interval extends to the next non-empty bucket's first event.

    Output is row-for-row identical to the single-pass operator (pinned by
    tests/test_sessionize_bucketed.py on random and hot-key data).
    """
    order_cols = [F.col("event_ts")]
    if "__order" in states.columns:
        order_cols.append(F.col("__order"))
    with_bucket = states.withColumn("__bucket", F.date_trunc(bucket, F.col("event_ts")))

    w1 = Window.partitionBy("instance_uuid", "__bucket").orderBy(*order_cols)
    local = with_bucket.select(
        "instance_uuid",
        "__bucket",
        "state",
        F.unix_micros(F.col("event_ts")).alias("start_us"),
        F.unix_micros(F.lead("event_ts").over(w1)).alias("end_us"),  # null = bucket tail
    )

    # one summary row per (id, bucket): when does the NEXT bucket start?
    summaries = (
        with_bucket.groupBy("instance_uuid", "__bucket")
        .agg(F.min(F.unix_micros("event_ts")).alias("first_us"))
    )
    w2 = Window.partitionBy("instance_uuid").orderBy("__bucket")
    next_start = summaries.select(
        "instance_uuid",
        "__bucket",
        F.lead("first_us").over(w2).alias("next_first_us"),
    )

    return (
        local.join(next_start, ["instance_uuid", "__bucket"])
        .select(
            "instance_uuid",
            "state",
            "start_us",
            F.coalesce("end_us", "next_first_us", F.lit(TS_MAX_US)).alias("end_us"),
        )
    )


def state_micros_in_window(
    intervals: DataFrame,
    window_start: datetime,
    window_end: datetime,
    *,
    outages: Iterable[tuple[datetime, datetime]] = (),
    states: Sequence[str] = BILLED_STATES,
) -> DataFrame:
    """Per-id microseconds in each billed state within ``[start, end)``,
    minus each outage interval's overlap (reference billing.py:88-102).

    Outage math is inline column arithmetic over interval bounds — the
    outage dimension is tiny, so it is folded into the projection rather
    than joined (zero extra shuffles; the only exchange is the groupBy,
    which reuses the window's hash partitioning on id).
    """
    w0, w1 = to_micros(window_start), to_micros(window_end)
    s, e = F.col("start_us"), F.col("end_us")
    net = overlap_micros(s, e, w0, w1)
    for o_start, o_end in outages:
        net = net - overlap_micros(s, e, to_micros(o_start), to_micros(o_end))

    aggs = [
        F.sum(F.when(F.col("state") == st, net).otherwise(F.lit(0).cast("long")))
        .alias(f"{st.lower()}_us")
        for st in states
    ]
    return intervals.groupBy("instance_uuid").agg(*aggs)


def state_micros_in_window_outages_df(
    intervals: DataFrame,
    window_start: datetime,
    window_end: datetime,
    outages_df: DataFrame,
    *,
    states: Sequence[str] = BILLED_STATES,
) -> DataFrame:
    """Outage exclusion via a broadcast join instead of inline literals —
    the right formulation when the outage dimension is large (thousands
    of intervals would bloat the literal expression tree; a broadcast
    join scales to any dimension that fits an executor).

    Σ over (interval × outage) overlap pairs equals the reference's
    per-outage state-machine replay (billing.py:95-100) by distributivity
    — identical to the literal path, test-pinned."""
    base = state_micros_in_window(intervals, window_start, window_end, states=states)
    o = outages_df.select(
        F.unix_micros("outage_start").alias("o0"),
        F.unix_micros("outage_end").alias("o1"),
    )
    ov = overlap_micros(F.col("start_us"), F.col("end_us"), F.col("o0"), F.col("o1"))
    exc = (
        intervals.join(F.broadcast(o))
        .groupBy("instance_uuid")
        .agg(
            *[
                F.sum(F.when(F.col("state") == st, ov).otherwise(F.lit(0).cast("long")))
                .alias(f"exc_{st.lower()}_us")
                for st in states
            ]
        )
    )
    joined = base.join(exc, "instance_uuid", "left")
    return joined.select(
        "instance_uuid",
        *[
            (
                F.col(f"{st.lower()}_us")
                - F.coalesce(F.col(f"exc_{st.lower()}_us"), F.lit(0).cast("long"))
            ).alias(f"{st.lower()}_us")
            for st in states
        ],
    )


# above this many intervals the inline-literal path would bloat the
# expression tree (one overlap term per outage per state); the
# broadcast-join path takes over (same auto-select idea as
# dedup._pick_verify_path)
_LITERAL_OUTAGES_MAX_ROWS = 64
# a file-backed dimension whose Catalyst size estimate exceeds this is
# big without needing a row probe (64 rows × a generous 256 B/row)
_LITERAL_OUTAGES_MAX_BYTES = _LITERAL_OUTAGES_MAX_ROWS * 256


def _probe_outage_literals(
    outages_df: DataFrame,
) -> list[tuple[datetime, datetime]] | None:
    """The tuples for the literal path if the dimension is small, else
    None (→ broadcast join).

    Catalyst's size estimate settles file-backed dimensions for free
    (real bytes, no job); Python-created local relations report unknown
    (Long.MaxValue), so those get a BOUNDED probe: collect at most
    max_rows+1 narrow rows — trivial for a real outage dim, and the
    limit caps the work if the dimension is huge. When the probe fits,
    the collected rows ARE the literals (no second job)."""
    from openstack_billing_from_db_spark.operators.parallelism import (
        plan_size_estimate,
    )

    size = plan_size_estimate(outages_df)
    if size is not None and size > _LITERAL_OUTAGES_MAX_BYTES:
        return None  # known-big: skip the probe
    # unknown size (None): fall through to the bounded probe
    rows = (
        outages_df.select("outage_start", "outage_end")
        .limit(_LITERAL_OUTAGES_MAX_ROWS + 1)
        .collect()
    )
    if len(rows) > _LITERAL_OUTAGES_MAX_ROWS:
        return None
    return [(r.outage_start, r.outage_end) for r in rows]


def state_micros_in_window_excluding(
    intervals: DataFrame,
    window_start: datetime,
    window_end: datetime,
    outages: DataFrame | Iterable[tuple[datetime, datetime]],
    *,
    states: Sequence[str] = BILLED_STATES,
) -> DataFrame:
    """ONE entry point for outage exclusion — auto-selects the physical
    strategy by dimension size, removing the manual choice between the
    two equivalent formulations (test-pinned equal):

    - small dimension → inline literal arithmetic
      (``state_micros_in_window``): zero extra shuffles, the overlap
      terms fold into the projection;
    - large dimension → broadcast join
      (``state_micros_in_window_outages_df``): scales to any dimension
      that fits an executor without bloating the expression tree.

    ``outages`` may be driver-side ``(start, end)`` tuples (always the
    literal path — the caller already materialized them) or an outage
    DataFrame (path picked by Catalyst size estimate + bounded probe,
    see ``_probe_outage_literals``).
    """
    if isinstance(outages, DataFrame):
        literals = _probe_outage_literals(outages)
        if literals is None:
            return state_micros_in_window_outages_df(
                intervals, window_start, window_end, outages, states=states
            )
        outages = literals
    return state_micros_in_window(
        intervals, window_start, window_end, outages=outages, states=states
    )


def outages_during(
    outages_df: DataFrame,
    window_start: datetime,
    window_end: datetime,
    cluster: str,
) -> list[tuple[datetime, datetime]]:
    """Reference ``get_outages_during`` (billing.py:121-124): the cluster's
    outage intervals overlapping the billing window, as driver-side tuples
    for the literal exclusion path. The dimension is tiny by construction;
    collect is intentional."""
    rows = (
        outages_df.filter(F.col("cluster") == cluster)
        .filter(
            (F.col("outage_end") > F.lit(window_start))
            & (F.col("outage_start") < F.lit(window_end))
        )
        .select("outage_start", "outage_end")
        .collect()
    )
    return [(r.outage_start, r.outage_end) for r in rows]


def runtime_micros(
    events: DataFrame,
    window_start: datetime,
    window_end: datetime,
    *,
    instances: DataFrame | None = None,
    outages: Iterable[tuple[datetime, datetime]] = (),
    id_col: str = "instance_uuid",
    ts_col: str = "created_at",
    action_col: str = "action",
    message_col: str | None = "message",
    trigger_states: Mapping[str, str] = DEFAULT_TRIGGER_STATES,
) -> DataFrame:
    """End-to-end: raw events (+optional instances for deleted_at) →
    per-id (running_us, stopped_us) within the window."""
    states = map_event_states(
        events,
        id_col=id_col,
        ts_col=ts_col,
        action_col=action_col,
        message_col=message_col,
        trigger_states=trigger_states,
    )
    if instances is not None:
        states = with_synthetic_deletes(states, instances)
    intervals = build_state_intervals(states)
    return state_micros_in_window(
        intervals, window_start, window_end, outages=outages
    )
