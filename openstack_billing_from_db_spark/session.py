"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the same config block is what we would
ship to a 1000-executor cluster (AQE, adaptive coalescing/skew-join,
arrow). Only master/memory are local-mode specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "openstack_billing_from_db_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    # Python workers pay ~100-185 ms of zipimport cache re-parsing on
    # EVERY task (see fast_worker_daemon's docstring) — the dominant
    # fixed cost of every Python-boundary stage. The custom daemon
    # module stat-gates that invalidation. The daemon process resolves
    # this package via PYTHONPATH, so the package root is appended to
    # the environment BEFORE the JVM launches (the JVM snapshot of the
    # env is what worker daemons inherit). Escape hatch:
    # SPARK_GRAFT_STOCK_PYTHON_DAEMON=1 restores the stock daemon.
    use_fast_daemon = os.environ.get("SPARK_GRAFT_STOCK_PYTHON_DAEMON") != "1"
    if use_fast_daemon:
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if pkg_root not in parts:
            os.environ["PYTHONPATH"] = os.pathsep.join(
                [p for p in parts if p] + [pkg_root]
            )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # match local parallelism; on a real cluster this scales with executors
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata parquet carries TIMESTAMP(NANOS) (unsupported by the
        # vectorized reader); read as long and canonicalize in the source
        # layer (sources/tables.py) — floor(ns/1000) matches DuckDB's
        # ns→us truncation bit-for-bit.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # short-lived test/bench streams: don't let the state-store
        # maintenance thread fire mid-workload
        .config("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # keep managed-table data out of the repo working directory
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
    )
    if use_fast_daemon:
        builder = builder.config(
            "spark.python.daemon.module",
            "openstack_billing_from_db_spark.fast_worker_daemon",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
