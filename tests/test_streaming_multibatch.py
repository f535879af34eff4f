"""Multi-batch streaming: state must carry across real micro-batch
boundaries. Events are split into 4 time-ordered files (one file = one
micro-batch via maxFilesPerTrigger=1); results must equal batch."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from openstack_billing_from_db_spark.operators.intervals import TS_MAX_US
from openstack_billing_from_db_spark.plans.billing import (
    TESTDATA_TRIGGERS,
    testdata_billing_tables as _billing_tables,
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

    actions, _ = _billing_tables(spark, sf_dir)
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
    run_stream_to_memory(
        streaming_gap_sessions(stream, "30 minutes", close_tails=False), name
    )
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.table(name).collect()
    }

    # batch oracle: session_window sessions, minus each user's LAST
    # session (still open in stream state when the stream ends)
    rows = _batch_sessions(spark, sf_dir)
    last_start = {}
    for r in rows:
        last_start[r.user_id] = max(last_start.get(r.user_id, 0), r.s)
    want = {
        (r.user_id, r.s, r.e, r.n_events)
        for r in rows
        if r.s != last_start[r.user_id]
    }
    assert got == want


def _batch_sessions(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("s"),
            F.unix_micros("w.end").alias("e"),
            "n_events",
        )
        .collect()
    )


def test_gap_sessions_event_time_timeout_closes_tails(spark, sf_dir, tmp_path):
    """With close_tails (the default), the emitted set equals batch
    session_window INCLUDING each user's final session, once the
    watermark advances past every session end (VERDICT item 8)."""
    from openstack_billing_from_db_spark.streaming.gap_sessions import (
        streaming_gap_sessions,
    )

    out_dir = str(tmp_path / "events_split3")
    _write_time_split_files(spark, sf_dir, out_dir)

    # sentinel file, replayed last: one far-future event for user -1
    # advances the watermark beyond last+gap of every real session
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    from datetime import timedelta

    sentinel = spark.createDataFrame(
        [(-1, max_ts + timedelta(hours=2), -1, "signup", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import glob
    import shutil

    sentinel.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/sentinel")
    part = glob.glob(f"{out_dir}/sentinel/part-*.parquet")[0]
    shutil.move(part, f"{out_dir}/99.parquet")
    shutil.rmtree(f"{out_dir}/sentinel")

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(out_dir)
    )
    name = f"gt_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(streaming_gap_sessions(stream, "30 minutes"), name)
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.table(name).collect()
        if r.user_id != -1
    }
    want = {
        (r.user_id, r.s, r.e, r.n_events) for r in _batch_sessions(spark, sf_dir)
    }
    assert got == want


def test_gap_sessions_out_of_order_keys_do_not_crash(spark, tmp_path):
    """Per-user blocked delivery: a key whose last+gap trails the
    stream-wide watermark must clamp its timeout (regression: raw
    setTimeoutTimestamp raises INVALID_TIMEOUT_TIMESTAMP), and with a
    watermark delay covering the disorder the result equals batch
    session_window exactly."""
    import glob
    import shutil
    from datetime import datetime, timedelta

    from openstack_billing_from_db_spark.streaming.gap_sessions import (
        streaming_gap_sessions,
    )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    base = datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in (1, 2):  # user 2's early events arrive AFTER user 1's late ones
        for m in (0, 10, 20, 120, 130, 300):
            rows.append((eid, base + timedelta(minutes=m + u), u, "click", 1.0, "{}"))
            eid += 1
    out = str(tmp_path / "ooo")
    chunks = [rows[0:4], rows[4:8], rows[8:12],
              [(99, base + timedelta(days=2), -1, "click", 0.0, "{}")]]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out}/f")
        shutil.move(glob.glob(f"{out}/f/part-*.parquet")[0], f"{out}/{i:02d}.parquet")
    shutil.rmtree(f"{out}/f")

    def run(delay):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(out)
        )
        name = f"oo_{uuid.uuid4().hex[:8]}"
        run_stream_to_memory(
            streaming_gap_sessions(stream, "30 minutes", watermark_delay=delay),
            name,
        )
        return {
            (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
            for r in spark.table(name).collect()
            if r.user_id != -1
        }

    ev = spark.createDataFrame(rows, schema)
    batch = {
        (r.user_id, r.s, r.e, r.n)
        for r in ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("s"),
            F.unix_micros("w.end").alias("e"),
            "n",
        )
        .collect()
    }
    # tight watermark: must COMPLETE (no INVALID_TIMEOUT_TIMESTAMP);
    # user 2's late-delivered events are dropped per watermark semantics,
    # so only session membership is sanity-checked
    tight = run("0 seconds")
    assert tight and all(t[0] in (1, 2) for t in tight)
    # watermark covering the disorder: exact batch equivalence
    assert run("6 hours") == batch


def test_multibatch_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """q75's join must produce the BATCH join result even when purchases
    and clicks arrive across 4 separate micro-batches — a purchase in
    batch 3 must still match a click from batch 1 held in join state."""
    from openstack_billing_from_db_spark.streaming.sessions import (
        stream_stream_attribution,
    )

    out_dir = str(tmp_path / "events_split_join")
    _write_time_split_files(spark, sf_dir, out_dir)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(out_dir)
    )
    purchases = stream.filter(F.col("event_type") == "purchase")
    clicks = stream.filter(F.col("event_type") == "click")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(stream_stream_attribution(purchases, clicks), name)
    got = {
        (r.purchase_id, r.click_id, r.user_id, r.gap_us)
        for r in spark.table(name).collect()
    }

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    want = {
        (r.purchase_id, r.click_id, r.user_id, r.gap_us)
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 15 minutes"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select(
            "purchase_id",
            "click_id",
            F.col("p_user").alias("user_id"),
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_watermarked_dedup_matches_plain_dedup(spark, sf_dir):
    """q82 (dropDuplicatesWithinWatermark, bounded state) must equal q52
    (unbounded dropDuplicates) when the replay fits the watermark."""
    from openstack_billing_from_db_spark.registry import all_queries

    qs = all_queries()
    a = sorted(map(tuple, qs["q52_streaming_dedup"](spark, sf_dir).collect()))
    b = sorted(map(tuple, qs["q82_streaming_dedup_watermarked"](spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_state_store_reader_exposes_window_state(spark, sf_dir, tmp_path):
    """Spark 4's statestore reader: operational debugging of a live
    stateful query's checkpoint. The windowed-count state keys must be
    exactly the (window, event_type) groups the batch aggregation
    produces — proving the checkpoint is inspectable without replay."""
    from openstack_billing_from_db_spark.sources.tables import load_table
    from openstack_billing_from_db_spark.streaming.sessions import (
        stream_events,
        windowed_event_counts,
    )

    import uuid as _uuid

    ckpt = str(tmp_path / "ckpt")
    name = f"ssr_{_uuid.uuid4().hex[:8]}"
    agg = windowed_event_counts(stream_events(spark, sf_dir))
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # append mode EMITS and EVICTS windows once the watermark passes;
    # whatever was not yet finalized must still sit in the state store —
    # emitted ∪ state is exactly the batch aggregation, with no overlap.
    emitted = {
        (r.window_start, r.event_type, r.n) for r in spark.table(name).collect()
    }
    state = spark.read.format("statestore").load(ckpt)
    in_state = {
        (r.key.window.start, r.key.event_type, r.value['count'])
        for r in state.collect()
    }
    assert emitted.isdisjoint(in_state)
    got = emitted | in_state

    ev = load_table(spark, sf_dir, "events")
    want = {
        (r.ws, r.event_type, r.n)
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    }
    assert got == want and len(want) > 0
