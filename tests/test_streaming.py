"""Streaming operator tests: memory sink + processAllAvailable, with
batch equivalence as the correctness oracle."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from openstack_billing_from_db_spark.plans.billing import TESTDATA_TRIGGERS
from openstack_billing_from_db_spark.streaming.sessions import (
    run_stream_to_memory,
    stream_events,
    streaming_state_intervals,
    windowed_event_counts,
)


def test_windowed_counts_match_batch(spark, sf_dir):
    name = f"wc_{uuid.uuid4().hex[:8]}"
    stream = stream_events(spark, sf_dir)
    run_stream_to_memory(
        windowed_event_counts(stream), name, output_mode="complete"
    )
    got = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 6))
        for r in spark.table(name).collect()
    }

    from openstack_billing_from_db_spark.sources.tables import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    want = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 6))
        for r in batch.collect()
    }
    assert got == want


def test_streaming_intervals_match_batch(spark, sf_dir):
    from openstack_billing_from_db_spark.operators.sessionize import (
        build_state_intervals,
        map_event_states,
    )
    from openstack_billing_from_db_spark.operators.intervals import TS_MAX_US
    from openstack_billing_from_db_spark.plans.billing import testdata_billing_tables

    name = f"iv_{uuid.uuid4().hex[:8]}"
    stream = stream_events(spark, sf_dir)
    run_stream_to_memory(
        streaming_state_intervals(stream, dict(TESTDATA_TRIGGERS)), name
    )
    got = {
        (r.instance_uuid, r.state, r.start_us, r.end_us)
        for r in spark.table(name).collect()
    }

    actions, _ = testdata_billing_tables(spark, sf_dir)
    batch = build_state_intervals(
        map_event_states(actions, trigger_states=TESTDATA_TRIGGERS, message_col=None)
    )
    closed = {
        (r.instance_uuid, r.state, r.start_us, r.end_us)
        for r in batch.collect()
        if r.end_us != TS_MAX_US  # stream holds the open tail in state
    }
    assert got == closed


def test_windowed_counts_rocksdb_state_store(spark, sf_dir):
    """PLANS.md claims the scale deployment flips the state store to
    RocksDB by config alone — prove the flip works and is result-identical
    to the default HDFS-backed provider (compared via the batch oracle)."""
    name = f"rdb_{uuid.uuid4().hex[:8]}"
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        stream = stream_events(spark, sf_dir)
        run_stream_to_memory(
            windowed_event_counts(stream), name, output_mode="complete"
        )
    finally:
        spark.conf.unset(key)

    from openstack_billing_from_db_spark.sources.tables import load_table

    got = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 6))
        for r in spark.table(name).collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    want = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 6))
        for r in batch.collect()
    }
    assert got == want


def test_stream_run_restores_shuffle_partitions_and_reports_stats(spark, sf_dir):
    """The per-run state-partition pin must not leak into later batch
    queries on the shared session (ADVICE r3), and each run must leave
    attribution stats (micro-batch / state-store commit counts)."""
    from openstack_billing_from_db_spark.streaming import sessions

    spark.conf.set("spark.sql.shuffle.partitions", "7")
    name = f"stats_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(
        windowed_event_counts(stream_events(spark, sf_dir)),
        name,
        output_mode="complete",
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == "7"

    stats = sessions.LAST_STREAM_STATS
    assert stats["name"] == name
    assert stats["micro_batches"] >= 1
    assert stats["state_commit_partitions"] == spark.sparkContext.defaultParallelism
    assert stats["state_rows_total"] >= 1  # windowed agg keeps state rows


def test_fast_local_checkpoints_sets_and_restores(spark, monkeypatch):
    """The ephemeral-checkpoint I/O conf (FileSystem-based manager, no
    checksum sidecars) applies only INSIDE a run and restores priors —
    the shared session must not keep the overrides — and the
    SPARK_GRAFT_DURABLE_CHECKPOINTS escape hatch bypasses it."""
    from openstack_billing_from_db_spark.streaming.sessions import (
        _EPHEMERAL_CHECKPOINT_CONF,
        fast_local_checkpoints,
    )

    keys = list(_EPHEMERAL_CHECKPOINT_CONF)
    priors = {k: spark.conf.get(k, None) for k in keys}
    with fast_local_checkpoints(spark):
        for k, v in _EPHEMERAL_CHECKPOINT_CONF.items():
            assert spark.conf.get(k) == v
    for k in keys:
        assert spark.conf.get(k, None) == priors[k]

    monkeypatch.setenv("SPARK_GRAFT_DURABLE_CHECKPOINTS", "1")
    sentinel = "org.example.KeepMe"
    spark.conf.set("spark.sql.streaming.checkpointFileManagerClass", sentinel)
    try:
        with fast_local_checkpoints(spark):
            assert (
                spark.conf.get("spark.sql.streaming.checkpointFileManagerClass")
                == sentinel
            )
    finally:
        spark.conf.unset("spark.sql.streaming.checkpointFileManagerClass")
