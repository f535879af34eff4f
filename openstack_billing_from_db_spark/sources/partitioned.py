"""Hive-style partitioned parquet layout: the primary scan-avoidance
mechanism at 100 TB (directory-level pruning happens during PLANNING,
before any file is opened — a date filter over a year of data lists one
day's directory instead of scanning 365 days' footers), plus dynamic
partition overwrite for idempotent incremental reruns.

Relation to the other layout tools: z-order (sources/zorder.py) skips
ROW GROUPS via min-max footer stats inside files; partitioning skips
whole DIRECTORIES via the catalog/file listing. Production tables use
both: partition by the coarse operational key (date, source), z-order
within partitions by the query keys.

The daily billing rerun (reference main.py's invoice window) maps to
``overwrite_partitions``: recompute one day, atomically replace exactly
that day's directory, leave every other day untouched — Spark's
``partitionOverwriteMode=dynamic`` gives the idempotent-rerun semantics
a MERGE would otherwise be needed for.

Reference: the reference writes flat CSV (no layout concept) —
beyond-reference scale component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` as Hive-layout parquet (``col=value/`` directories).

    Repartitions by the partition columns first so each partition's
    rows are produced by ``files_per_partition`` tasks — without this a
    write from N upstream partitions emits up to N small files into
    EVERY partition directory (the classic small-files explosion; the
    fix is the same co-location law as the compaction tool)."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    (
        df.repartition(files_per_partition, *partition_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    files_per_partition: int = 1,
) -> None:
    """Dynamic partition overwrite: replace ONLY the partition
    directories present in ``df``; every other partition survives
    byte-identical. The idempotent incremental-rerun primitive (re-run
    a day, re-land that day). The session conf is set for the duration
    of the write and restored after."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, "dynamic")
    try:
        (
            df.repartition(files_per_partition, *partition_cols)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
