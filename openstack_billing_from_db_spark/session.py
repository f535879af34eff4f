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
    )
    # Local mode runs executor task threads, the driver's
    # planning/scheduling threads, AND the JVM's GC threads on the same
    # machine — and JDK 17's G1 defaults ParallelGCThreads to ~5/8 of the
    # visible cores (≈23 on a 32-core box). With local[cores] every task
    # slot is already busy, so each young-GC pause mobilizes a second
    # army of threads against fully-subscribed CPUs and the driver's
    # between-stage latency balloons (measured at sf0.1/local[32]:
    # per-query median 0.874 with the cap vs without; an 8-query
    # driver-build-heavy block read 10.7 s capped vs 15.5 s stock,
    # min-of-two per query). Cap GC parallelism to a quarter of the task
    # slots (floor 4/2) — scales with SPARK_GRAFT_CPUS, so low-core bench
    # runs keep comparable behavior. On a real cluster executors are
    # dedicated containers where the JVM default is appropriate: the cap
    # applies to LOCAL masters only. Escape hatch:
    # SPARK_GRAFT_STOCK_GC=1.
    if master.startswith("local") and os.environ.get("SPARK_GRAFT_STOCK_GC") != "1":
        try:
            n_slots = int(master.split("[", 1)[1].rstrip("]"))
        except (IndexError, ValueError):
            n_slots = os.cpu_count() or 8  # local / local[*]
        gc_threads = max(4, n_slots // 4)
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-XX:ParallelGCThreads={gc_threads}"
            f" -XX:ConcGCThreads={max(2, gc_threads // 4)}",
        )
    builder = (
        builder
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
    # JVM-launch-time settings (daemon module, extraJavaOptions) only
    # take effect when getOrCreate CREATES the context; against a
    # pre-existing session spark.conf.get still REPORTS the requested
    # values while the stock daemon/GC keep running (ADVICE r12 #2) —
    # surface that instead of silently mis-reporting.
    from pyspark import SparkContext

    preexisting = SparkContext._active_spark_context is not None
    spark = builder.getOrCreate()
    if preexisting:
        import warnings

        warnings.warn(
            "get_spark reused a pre-existing SparkContext: JVM-launch-time "
            "settings (spark.python.daemon.module, driver extraJavaOptions) "
            "from this call are NOT in effect even though spark.conf reports "
            "them",
            RuntimeWarning,
            stacklevel=2,
        )
    spark.sparkContext.setLogLevel("WARN")
    return spark
