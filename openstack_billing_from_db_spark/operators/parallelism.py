"""Input-parallelism guard for CPU-heavy map stages.

Spark's map-side parallelism equals the scan's split count. Parquet can
only split at row-group boundaries, so a small table written as one file
with one row group scans as ONE partition — and a shingle/hash/codec
stage then runs on one core while the rest of the cluster idles. (File
-split configs like ``spark.sql.files.minPartitionNum`` cannot help:
there is no row-group boundary to split at.)

``ensure_map_parallelism`` rebalances only when the scan is badly under-
parallel relative to the cluster. At 100 TB the input has orders of
magnitude more splits than cores, the guard is a no-op, and no exchange
is added; on small/mis-written inputs it costs one cheap round-robin
shuffle of raw rows and buys full-width execution of everything above it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_map_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan's partition count is below
    half the target (default ``sparkContext.defaultParallelism``)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
