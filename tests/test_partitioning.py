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


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """DPP: when the partition column arrives through a JOIN (the
    star-schema shape — fact partitioned by date, dim filtered at
    runtime), Spark injects a dynamicpruning subquery into the fact
    scan's PartitionFilters so only dim-surviving partitions are read.
    This is the scan killer for 100 TB star joins: the static pruning
    test above needs the literal window in the query; DPP prunes even
    when the dates come from data."""
    import pyspark.sql.functions as F

    out = str(tmp_path / "events_by_date")
    events = load_table(spark, sf_dir, "events")
    write_events_partitioned(events, out)
    fact = spark.read.parquet(out)

    # runtime dim: event dates seen on urgent orders — a file-sourced,
    # selectively-filtered dimension whose surviving dates are only
    # known at execution time (the DPP-qualifying shape)
    orders = load_table(spark, sf_dir, "orders")
    dim = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.to_date("o_orderdate").alias("event_date"))
        .distinct()
    )
    joined = fact.join(F.broadcast(dim), "event_date")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan

    dim_rows = [r.event_date for r in dim.collect()]
    expected = fact.filter(F.col("event_date").isin(dim_rows)).count()
    assert joined.count() == expected
