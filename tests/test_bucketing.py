"""Prove that bucketed tables make the key join/aggregation exchange-free
(the 100 TB co-location strategy documented in PLANS.md).

At test scale Catalyst correctly prefers a broadcast join, which would
hide the bucketing; we disable auto-broadcast to force the sort-merge
path a 100 TB fact-fact join would take, and assert no shuffle exchange
appears on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.sources.bucketing import write_bucketed_table
from openstack_billing_from_db_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, no_broadcast):
    events = load_table(spark, sf_dir, "events")
    users = events.select("user_id").distinct().withColumn(
        "segment", F.col("user_id") % 4
    )
    write_bucketed_table(events, "ev_bucketed", ["user_id"], 8, sort_cols=["ts"])
    write_bucketed_table(users, "users_bucketed", ["user_id"], 8)

    joined = spark.table("ev_bucketed").join(spark.table("users_bucketed"), "user_id")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() > 0

    # un-bucketed control: the same join must shuffle both sides
    control = events.join(users, "user_id")
    assert "Exchange hashpartitioning" in _plan(control)


def test_bucketed_aggregation_has_no_shuffle(spark, sf_dir, no_broadcast):
    events = load_table(spark, sf_dir, "events")
    write_bucketed_table(events, "ev_bucketed_agg", ["user_id"], 8)
    agg = (
        spark.table("ev_bucketed_agg")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert "Exchange" not in _plan(agg)
    assert agg.count() > 0
