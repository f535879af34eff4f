"""Streaming incremental cardinality: count distinct values per group
over an unbounded file stream with O(k) state per group — the KMV sketch
(operators/sketch.py) as a foreachBatch accumulator.

Raw values are never retained beyond each group's current k minima
(~k × 16 bytes per group — for k=16, a quarter-kilobyte per group
regardless of whether the group has seen a thousand or a trillion
distinct values). That bounded state is what `dropDuplicates`-then-count
can NOT give a stream: exact streaming distinct-count state grows with
the true cardinality and eventually evicts (watermark) or OOMs.

Exactly-once without a transactional format (same epoch-partition
pattern as streaming/dedup_stream.py): each micro-batch's per-group
k-minima land in their own ``epoch=<id>`` partition with overwrite
semantics, so a replayed micro-batch is idempotent; the live sketch is
the union of all epoch partitions re-truncated to k per group
(:func:`operators.sketch.kmv_merge` — merge-and-truncate is exactly the
KMV union law, so the streamed estimate equals the batch estimate over
the same data, pinned by test_kmv_stream).

At 100 TB/day: per micro-batch work is one DISTINCT-reduce of the batch
plus a k-min window over the batch's vocabulary; state directory growth
is ≤ k·groups rows per epoch — compact with
sources/maintenance.compact_parquet like any epoch log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openstack_billing_from_db_spark.operators.sketch import (
    kmv_finalize,
    kmv_merge,
    kmv_partial,
)


def update_batch(
    batch_df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    k: int = 16,
) -> DataFrame:
    """One micro-batch → its per-group KMV state rows (≤ k per group)."""
    return kmv_partial(batch_df, group_col=group_col, value_col=value_col, k=k)


def run_streaming_kmv(
    spark: SparkSession,
    stream_dir: str,
    schema: str,
    state_dir: str,
    checkpoint_dir: str,
    *,
    group_col: str,
    value_col: str,
    k: int = 16,
) -> None:
    """Stream files → per-epoch KMV state partitions. Runs to completion
    on the available files (processAllAvailable) and stops; re-running
    picks up new files from the checkpoint."""

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        part = update_batch(
            batch_df, group_col=group_col, value_col=value_col, k=k
        )
        part.write.mode("overwrite").parquet(f"{state_dir}/epoch={epoch_id}")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def read_kmv_estimate(
    spark: SparkSession,
    state_dir: str,
    *,
    group_col: str,
    k: int = 16,
) -> DataFrame:
    """The live estimate: merge every epoch's state and finalize.
    Output: (group, k_used, kth_hash, est_distinct)."""
    state = spark.read.parquet(state_dir).select(group_col, "v", "h")
    return kmv_finalize(
        kmv_merge(state, group_col=group_col, k=k), group_col=group_col, k=k
    )
