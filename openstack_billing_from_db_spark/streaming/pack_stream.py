"""Streaming greedy sequence packing: documents arrive as files (in
doc_id order — the stream contract that makes incremental packing
equivalent to one batch run), each micro-batch continues the per-shard
open-bin state with operators/curation.greedy_pack_continue, and the
epoch's assignments plus the MERGED state snapshot land in their own
``epoch=<id>`` partitions (the dedup_stream exactly-once pattern: a
replayed micro-batch overwrites its own partitions, and it re-reads the
PRE-epoch state because the latest-state lookup is bounded to epochs
strictly before its own id).

State is shards-sized ((shard, open_bin, open_acc) — bytes per shard),
so every epoch snapshot is trivially cheap; assignments are the
per-epoch output artifact. At 100 TB the same contract as q148: the
packing state lives per shard, parallelism = tune_pack_shards(corpus),
and only narrow (shard, id, weight) rows enter the Arrow stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.streaming.sessions import (
    run_foreachbatch_stream,
)
from openstack_billing_from_db_spark.operators.curation import (
    greedy_pack_continue,
    merge_pack_state,
    pack_state,
)
from openstack_billing_from_db_spark.operators.text import words


def _check_pack_config(spark: SparkSession, state_dir: str, **config) -> None:
    """Pin the packing layout constants to the persisted state: write
    them on first run, assert equality on resume. Greedy packing is
    only ≡ one batch run when every epoch shares the same hash sharding
    (shards, seed) and overflow rule (budget). Goes through the Hadoop
    FileSystem API so the pin holds for ANY state_dir the Spark readers
    in this module support (hdfs://, s3a://, file:, bare local paths) —
    a local-only pathlib check would silently no-op on remote URIs,
    which is exactly the resume this guard exists to refuse."""
    import json

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(state_dir, "_pack_config.json")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        stream = fs.open(hpath)
        try:
            stored = json.loads(
                jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
            )
        finally:
            stream.close()
        if stored != config:
            raise ValueError(
                "persisted pack state was written with a different "
                f"configuration: stored={stored}, requested={config}; "
                "continuing would produce assignments equal to no "
                "batch run"
            )
        return
    out = fs.create(hpath, True)
    try:
        out.write(json.dumps(config, sort_keys=True).encode("utf-8"))
    finally:
        out.close()


def _latest_state(
    spark: SparkSession, state_dir: str, before_epoch: int
) -> DataFrame | None:
    """State snapshot of the newest epoch strictly before
    ``before_epoch`` (replay-safe: a re-run epoch must not read its own
    previous output), or None when no prior epoch exists."""
    try:
        all_epochs = spark.read.parquet(state_dir)
    except Exception:
        return None
    prior = all_epochs.filter(F.col("epoch") < before_epoch)
    row = prior.agg(F.max("epoch").alias("m")).collect()[0]
    if row.m is None:
        return None
    return prior.filter(F.col("epoch") == row.m).drop("epoch")


def run_streaming_greedy_pack(
    spark: SparkSession,
    docs_stream_dir: str,
    assignments_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    *,
    budget: int,
    shards: int = 8,
    seed: str = "gpack",
) -> None:
    """Document-file stream → per-epoch greedy packing assignments +
    merged open-bin state snapshots. Runs to completion on the
    available files (processAllAvailable) and stops; re-running picks
    up new files from the checkpoint and continues the packing from the
    persisted state — the multi-run union of assignment epochs is
    pinned equal to one greedy_pack_bins batch over all documents.

    (shards, budget, seed) are recorded in a ``_pack_config.json``
    sidecar next to the state snapshots on the first run (the leading
    underscore hides it from Spark's file index); a later invocation
    with different values would silently continue with mismatched hash
    sharding — assignments equal to no batch run — so resume asserts
    the sidecar matches before processing any batch."""
    from openstack_billing_from_db_spark.functions.hashing import seeded_hash64
    from openstack_billing_from_db_spark.streaming.dedup_stream import (
        _epoch_snapshot,
    )

    _check_pack_config(spark, state_dir, shards=shards, budget=budget, seed=seed)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_stream_dir)
    )

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        toks = batch_df.select(
            "doc_id",
            (seeded_hash64(F.col("doc_id").cast("string"), seed) % shards).alias(
                "shard"
            ),
            F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
        )
        prev = _latest_state(spark, state_dir, epoch_id)
        assigns = greedy_pack_continue(toks, prev, budget=budget)
        # snapshot BEFORE the epoch writes land (the state DAG reads
        # state_dir); release the blocks once the epoch commits
        assigns, release_a = _epoch_snapshot(spark, assigns)
        new_state, release_s = _epoch_snapshot(
            spark, merge_pack_state(prev, pack_state(assigns))
        )
        try:
            assigns.write.mode("overwrite").parquet(
                f"{assignments_dir}/epoch={epoch_id}"
            )
            new_state.write.mode("overwrite").parquet(
                f"{state_dir}/epoch={epoch_id}"
            )
        finally:
            release_a()
            release_s()

    run_foreachbatch_stream(
        stream.writeStream.foreachBatch(step).option(
            "checkpointLocation", checkpoint_dir
        ),
        stream.sparkSession,
    )


def read_assignments(spark: SparkSession, assignments_dir: str) -> DataFrame:
    """Union of all epoch assignment partitions (each doc appears in
    exactly one epoch)."""
    return spark.read.parquet(assignments_dir).drop("epoch")
