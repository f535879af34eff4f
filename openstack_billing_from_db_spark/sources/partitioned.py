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
that day's directory, leave every other day untouched — the writer-level
``partitionOverwriteMode=dynamic`` option gives the idempotent-rerun
semantics a MERGE would otherwise be needed for.

Reference: the reference writes flat CSV (no layout concept) —
beyond-reference scale component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__fpp_salt"


def _salted_by_partition(
    df: DataFrame, partition_cols: list[str], files_per_partition: int
) -> DataFrame:
    """Cluster rows by (partition value, salt) so each partition
    directory is written by up to ``files_per_partition`` tasks.

    A bare ``repartition(k, *partition_cols)`` would hash every row of
    one partition VALUE onto one of k total tasks — one file per
    directory and write parallelism capped at k, regardless of k. The
    deterministic row-hash salt splits each partition value across
    ``files_per_partition`` clusters instead, so parallelism scales
    with (number of partition values × files_per_partition) and each
    directory receives at most ``files_per_partition`` files."""
    if files_per_partition < 1:
        raise ValueError(
            f"files_per_partition must be >= 1; got {files_per_partition}"
        )
    salted = df.withColumn(
        _SALT,
        F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(files_per_partition)),
    )
    # explicit numPartitions: a column-only repartition is an AQE-
    # coalescable exchange, which on a small input merges back to one
    # task and silently defeats the fan-out (observed at sf0.001);
    # REPARTITION_BY_NUM is honored as given. defaultParallelism scales
    # with the cluster, so the shuffle width follows executor count.
    n = max(
        df.sparkSession.sparkContext.defaultParallelism, files_per_partition
    )
    return salted.repartition(n, *partition_cols, _SALT).drop(_SALT)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` as Hive-layout parquet (``col=value/`` directories),
    at most ``files_per_partition`` files per partition directory (see
    :func:`_salted_by_partition` — this avoids both the small-files
    explosion of a naive partitioned write and the one-task-per-
    partition-value serialization of ``repartition(k, cols)``)."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    (
        _salted_by_partition(df, partition_cols, files_per_partition)
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
    a day, re-land that day). Scoped with the WRITER-level
    ``partitionOverwriteMode`` option, which takes precedence over the
    session conf — no session-global mutation, so concurrent writes in
    the same session keep their own modes."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    (
        _salted_by_partition(df, partition_cols, files_per_partition)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
