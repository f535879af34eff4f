"""Query registry: every implemented operator as a (Spark plan, DuckDB
oracle SQL) pair.

The driver contract (__spark_entry__.py) runs each ``QUERIES[name]`` at
sf0.01 and hash-compares rows/schema/values against ``ORACLE[name]`` run
by DuckDB over the same parquet. Numeric strategy for exact parity:

- all interval math in integer microseconds (``unix_micros`` ≡ ``epoch_us``);
- money in DecimalType, multiplied/rounded before a final cast to double
  (exact decimal → identical double bits in both engines);
- double aggregations are cast to decimal pre-sum (``CAST(x AS DECIMAL)``
  is cross-engine exact; ``round(double)`` is NOT and is never used);
- averages computed as ``CAST(decimal_sum AS DOUBLE) / count`` — a single
  deterministic double division instead of an order-dependent double sum.

Query definitions live next to their operators and register themselves on
import (see ``load_all``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_QUERY_MODULES = (
    "openstack_billing_from_db_spark.plans.billing_queries",
    "openstack_billing_from_db_spark.plans.analytics_queries",
    "openstack_billing_from_db_spark.plans.pipeline_queries",
    "openstack_billing_from_db_spark.plans.streaming_queries",
)

_loaded = False


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    import importlib

    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _loaded = True


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all()
    return dict(QUERIES)


def all_oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
