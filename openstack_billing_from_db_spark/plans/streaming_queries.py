"""Streaming registry entries. Each callable drives a Structured
Streaming query to completion into a memory sink (processAllAvailable)
and returns the result table — deterministic, so the windowed aggregation
gets a full DuckDB oracle; the stateful sessionization is rows-only (the
driver records the weaker check; batch-equivalence is pinned in
tests/test_streaming.py instead)."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.registry import register


@register(
    "q50_streaming_windowed_counts",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def q50_streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows with a 30-minute watermark, run as a real
    streaming query (complete mode emits every window, making the result
    batch-equivalent and oracle-checkable)."""
    from openstack_billing_from_db_spark.streaming.sessions import (
        run_stream_to_memory,
        stream_events,
    )

    name = f"q50_{uuid.uuid4().hex[:8]}"
    stream = stream_events(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    run_stream_to_memory(agg, name, output_mode="complete")
    return spark.table(name)


@register(
    "q52_streaming_dedup",
    oracle="""
SELECT event_type, count(*) AS n_distinct_events
FROM (SELECT DISTINCT event_id, event_type FROM events)
GROUP BY event_type
""",
)
def q52_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once event dedup: dropDuplicates on the stream
    (state keyed by event_id) then per-type counts — the streaming half
    of the dedup story (batch half: q34)."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from openstack_billing_from_db_spark.streaming.sessions import (
        run_stream_to_memory,
        stream_events,
    )

    name = f"q52_{_uuid.uuid4().hex[:8]}"
    stream = stream_events(spark, sf_dir).dropDuplicates(["event_id"])
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_distinct_events")
    )
    run_stream_to_memory(agg, name, output_mode="complete")
    return spark.table(name)


def _q51_oracle() -> str:
    # the stream emits exactly the SUCCESSOR-CLOSED intervals: every
    # (state, ts, next_ts) pair — i.e. the batch interval set (q04's
    # _iv_sql) minus each instance's open tail. Deterministic, so it
    # gets a full value-hash oracle (VERDICT item 10).
    from openstack_billing_from_db_spark.operators.intervals import TS_MAX_US
    from openstack_billing_from_db_spark.plans.billing_queries import _iv_sql

    return f"""
SELECT instance_uuid, state, start_us, end_us
FROM ({_iv_sql()})
WHERE end_us <> {TS_MAX_US}
"""


@register("q51_streaming_state_intervals", oracle=_q51_oracle())
def q51_streaming_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The E2 state machine as a stateful streaming operator
    (applyInPandasWithState), value-hash-checked against the batch
    interval SQL restricted to successor-closed intervals."""
    from openstack_billing_from_db_spark.plans.billing import TESTDATA_TRIGGERS
    from openstack_billing_from_db_spark.streaming.sessions import (
        run_stream_to_memory,
        stream_events,
        streaming_state_intervals,
    )

    name = f"q51_{uuid.uuid4().hex[:8]}"
    stream = stream_events(spark, sf_dir)
    run_stream_to_memory(streaming_state_intervals(stream, dict(TESTDATA_TRIGGERS)), name)
    return spark.table(name)


@register(
    "q75_stream_stream_join",
    oracle="""
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 15 MINUTE
 AND c.ts <= p.ts
""",
)
def q75_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (click→purchase attribution
    within 15 minutes) — the remaining Structured Streaming join shape:
    two-sided event-time bounds let Spark evict join state at the
    watermark (streaming/sessions.stream_stream_attribution). Fully
    processed streams make the result batch-equivalent, so it carries a
    complete value-hash oracle."""
    from openstack_billing_from_db_spark.streaming.sessions import (
        run_stream_to_memory,
        stream_events,
        stream_stream_attribution,
    )

    name = f"q75_{uuid.uuid4().hex[:8]}"
    events = stream_events(spark, sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click")
    run_stream_to_memory(stream_stream_attribution(purchases, clicks), name)
    return spark.table(name)


@register(
    "q82_streaming_dedup_watermarked",
    oracle="""
SELECT event_type, count(*) AS n_distinct_events
FROM (SELECT DISTINCT event_id, event_type FROM events)
GROUP BY event_type
""",
)
def q82_streaming_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q52's dedup with BOUNDED state: dropDuplicatesWithinWatermark
    evicts seen-key state once the watermark passes — the formulation an
    unbounded 24/7 stream needs (plain dropDuplicates state grows
    forever). Same result as q52 here because the replay fits inside the
    watermark horizon; the operator difference is the state-lifetime
    contract, pinned equal to q52 by pytest."""
    name = f"q82_{uuid.uuid4().hex[:8]}"
    from openstack_billing_from_db_spark.streaming.sessions import (
        run_stream_to_memory,
        stream_events,
    )

    stream = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_distinct_events")
    )
    run_stream_to_memory(agg, name, output_mode="complete")
    return spark.table(name)
