"""The skew-resistant bucketed sessionizer must be row-for-row identical
to the single-pass operator — on random multi-instance data and on a
pathological hot key."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from openstack_billing_from_db_spark.operators.sessionize import (
    build_state_intervals,
    build_state_intervals_bucketed,
    map_event_states,
)

ACTIONS = ["create", "start", "stop", "shelve", "unshelve", "delete", "noop"]


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "instance_uuid string, created_at timestamp, action string, message string"
    )


def _intervals(df):
    return sorted((r.instance_uuid, r.state, r.start_us, r.end_us) for r in df.collect())


def test_bucketed_equals_single_pass_random(spark):
    rng = random.Random(4242)
    rows = []
    for i in range(120):
        t = datetime(2000, 1, 1) + timedelta(hours=rng.randint(0, 2000))
        for _ in range(rng.randint(1, 15)):
            t += timedelta(minutes=rng.randint(1, 5000))
            rows.append((f"i{i}", t, rng.choice(ACTIONS), ""))
    states = map_event_states(_events(spark, rows))
    assert _intervals(build_state_intervals_bucketed(states)) == _intervals(
        build_state_intervals(states)
    )


def test_bucketed_equals_single_pass_hot_key(spark):
    """One instance spanning many months — the case the bucketing exists
    for — plus instances whose buckets contain a single event."""
    rows = []
    t = datetime(2000, 1, 1)
    for k in range(500):  # hot id: events across ~17 months
        t += timedelta(hours=25)
        rows.append(("hot", t, ACTIONS[k % 6], ""))
    rows.append(("sparse", datetime(2000, 3, 15), "create", ""))
    rows.append(("sparse", datetime(2001, 7, 1), "delete", ""))
    states = map_event_states(_events(spark, rows))
    assert _intervals(build_state_intervals_bucketed(states)) == _intervals(
        build_state_intervals(states)
    )
