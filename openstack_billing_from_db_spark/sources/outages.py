"""Outage-interval dimension (reference billing.py:121-124).

The reference fetches cluster outage intervals over HTTP and subtracts
each from every instance's runtime (billing.py:88-102). Here outages are
a tiny ``(cluster, outage_start, outage_end)`` dimension; the exclusion
itself is literal-array interval math in the sessionization operator —
no join, no shuffle (operators/sessionize.py).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from openstack_billing_from_db_spark.schemas import OUTAGES


def outages_df(
    spark: SparkSession,
    intervals: list[tuple[datetime, datetime]],
    cluster: str = "stack",
) -> DataFrame:
    rows = [(cluster, s, e) for s, e in intervals]
    return spark.createDataFrame(rows, schema=OUTAGES)
