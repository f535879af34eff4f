"""foreachBatch incremental runtime maintenance: streaming totals must
equal the batch closed-interval totals."""

from __future__ import annotations

from pyspark.sql import functions as F

from openstack_billing_from_db_spark.operators.intervals import TS_MAX_US
from openstack_billing_from_db_spark.plans.billing import (
    TESTDATA_TRIGGERS,
    testdata_billing_tables as _billing_tables,  # underscore: not a test
)
from openstack_billing_from_db_spark.streaming.incremental import (
    read_incremental_runtime,
    run_incremental_runtime,
)


def test_incremental_runtime_matches_batch(spark, sf_dir, tmp_path):
    target = str(tmp_path / "runtime_agg")
    ckpt = str(tmp_path / "ckpt")
    run_incremental_runtime(spark, sf_dir, target, ckpt, dict(TESTDATA_TRIGGERS))

    got = {
        (r.instance_uuid, r.state): r.micros
        for r in read_incremental_runtime(spark, target).collect()
    }

    from openstack_billing_from_db_spark.operators.sessionize import (
        build_state_intervals,
        map_event_states,
    )

    actions, _ = _billing_tables(spark, sf_dir)
    batch = (
        build_state_intervals(
            map_event_states(actions, trigger_states=TESTDATA_TRIGGERS, message_col=None)
        )
        .filter(F.col("end_us") != TS_MAX_US)  # stream holds open tails in state
        .groupBy("instance_uuid", "state")
        .agg(F.sum(F.col("end_us") - F.col("start_us")).alias("micros"))
    )
    want = {(r.instance_uuid, r.state): r.micros for r in batch.collect()}
    assert got == want
