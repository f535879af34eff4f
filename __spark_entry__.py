"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``openstack_billing_from_db_spark``; this module
is a thin shim over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: events → state-machine
    sessionization → clamped-overlap runtime → ceil SU-hours → priced
    per-project invoice (the reference's billing.py:116-224 pipeline)."""
    from openstack_billing_from_db_spark.plans.billing import testdata_invoice

    return testdata_invoice(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from openstack_billing_from_db_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from openstack_billing_from_db_spark.registry import all_oracle_sql

    return all_oracle_sql()
