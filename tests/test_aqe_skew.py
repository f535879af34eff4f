"""AQE skew-join handling: a hot join key must be split at runtime
(PLANS.md relies on this for the dedup verify join's giant-cluster skew).
Thresholds are lowered so test-scale data triggers the same rule that
fires on production-scale skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture
def skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONF}
    for k, v in _SKEW_CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is not None:
            spark.conf.set(k, v)
        else:
            spark.conf.unset(k)


def test_skewed_join_is_split_at_runtime(spark, skew_conf):
    # 95% of fact rows share key 0
    fact = spark.range(400_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("payload_"), F.col("id").cast("string")).alias("p"),
    )
    dim = spark.range(50_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    joined = fact.join(dim, "k")
    rows = joined.collect()  # executes this QueryExecution → final AQE plan attached
    # key 0: 380,000 hot rows + id=0 itself; plus multiples of 20 below 50k
    assert len(rows) == 380_001 + 2_499

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan, plan
