"""Multi-batch streaming: state must carry across real micro-batch
boundaries. Events are split into 4 time-ordered files (one file = one
micro-batch via maxFilesPerTrigger=1); results must equal batch."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from openstack_billing_from_db_spark.operators.intervals import TS_MAX_US
from openstack_billing_from_db_spark.plans.billing import (
    TESTDATA_TRIGGERS,
    testdata_billing_tables,
)
from openstack_billing_from_db_spark.sources.tables import load_table
from openstack_billing_from_db_spark.streaming.sessions import (
    run_stream_to_memory,
    streaming_state_intervals,
)


def _write_time_split_files(spark, sf_dir, out_dir, n_files=4):
    """Split events into n time-ordered parquet files, written oldest
    first so the file-stream source replays them in event-time order."""
    import glob
    import shutil

    ev = load_table(spark, sf_dir, "events")
    n_rows = ev.count()
    per_file = (n_rows + n_files - 1) // n_files
    ranked = ev.orderBy("ts", "event_id").collect()
    for i in range(n_files):
        chunk = ranked[i * per_file : (i + 1) * per_file]
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/f{i:02d}")
        part = glob.glob(f"{out_dir}/f{i:02d}/part-*.parquet")[0]
        shutil.move(part, f"{out_dir}/{i:02d}.parquet")
        shutil.rmtree(f"{out_dir}/f{i:02d}")


def test_multibatch_intervals_match_batch(spark, sf_dir, tmp_path):
    out_dir = str(tmp_path / "events_split")
    _write_time_split_files(spark, sf_dir, out_dir)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(out_dir)
    )
    name = f"mb_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(
        streaming_state_intervals(stream, dict(TESTDATA_TRIGGERS)), name
    )
    got = {
        (r.instance_uuid, r.state, r.start_us, r.end_us)
        for r in spark.table(name).collect()
    }

    from openstack_billing_from_db_spark.operators.sessionize import (
        build_state_intervals,
        map_event_states,
    )

    actions, _ = testdata_billing_tables(spark, sf_dir)
    closed = {
        (r.instance_uuid, r.state, r.start_us, r.end_us)
        for r in build_state_intervals(
            map_event_states(actions, trigger_states=TESTDATA_TRIGGERS, message_col=None)
        ).collect()
        if r.end_us != TS_MAX_US
    }
    assert got == closed


def test_multibatch_gap_sessions_match_batch(spark, sf_dir, tmp_path):
    from openstack_billing_from_db_spark.streaming.gap_sessions import (
        streaming_gap_sessions,
    )

    out_dir = str(tmp_path / "events_split2")
    _write_time_split_files(spark, sf_dir, out_dir)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(out_dir)
    )
    name = f"gs_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(streaming_gap_sessions(stream, "30 minutes"), name)
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.table(name).collect()
    }

    # batch oracle: session_window sessions, minus each user's LAST
    # session (still open in stream state when the stream ends)
    ev = load_table(spark, sf_dir, "events")
    sw = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("s"),
            F.unix_micros("w.end").alias("e"),
            "n_events",
        )
    )
    rows = sw.collect()
    last_start = {}
    for r in rows:
        last_start[r.user_id] = max(last_start.get(r.user_id, 0), r.s)
    want = {
        (r.user_id, r.s, r.e, r.n_events)
        for r in rows
        if r.s != last_start[r.user_id]
    }
    assert got == want
