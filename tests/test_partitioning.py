"""Partition-pruned event layout: the billing window must prune
directories at the scan (PLANS.md ingest-side strategy)."""

from __future__ import annotations

from datetime import datetime

from openstack_billing_from_db_spark.sources.partitioning import (
    read_events_window,
    write_events_partitioned,
)
from openstack_billing_from_db_spark.sources.tables import load_table


def test_partition_pruning_on_billing_window(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_date")
    events = load_table(spark, sf_dir, "events")
    write_events_partitioned(events, out)

    window = (datetime(2024, 1, 10), datetime(2024, 1, 15))
    scoped = read_events_window(spark, out, *window)
    plan = scoped._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan, plan
    assert "PushedFilters: [IsNotNull(ts)" in plan, plan

    # counts match an unpartitioned filter of the same window
    expected = events.filter(
        (events.ts >= window[0]) & (events.ts < window[1])
    ).count()
    assert scoped.count() == expected

    # pruning actually reduces the files read: 5 of ~30 daily partitions
    import os

    n_parts = len([d for d in os.listdir(out) if d.startswith("event_date=")])
    assert n_parts >= 25
