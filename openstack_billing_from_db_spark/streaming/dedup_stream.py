"""Streaming incremental near-dup dedup: documents arrive as files, each
micro-batch is signature-checked against the persisted MinHash index
(operators/dedup.minhash_index — no raw text retained), and only unique
docs' band rows are folded back in.

Exactly-once without a transactional format (same pattern as
streaming/incremental.py): every epoch's index additions and verdicts
land in their own ``epoch=<id>`` partition with overwrite semantics, so
a replayed micro-batch is idempotent; the live index is simply the union
of all epoch partitions.

Within-batch duplicate families keep their minimum-id member: a doc is
admitted iff its best match is not a duplicate at all, or is a LATER
member of the same batch (so exactly one canonical survivor per new
family enters the index, and nothing enters when the family's best match
already lives in the index).

At 100 TB: per micro-batch work is (batch signatures) + (band-bucket
join against the index) — the index is ~100 B/doc and grows at the
unique-doc rate; periodic compaction of the epoch partitions
(sources/maintenance.compact_parquet) bounds file counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.operators.dedup import (
    incremental_near_duplicates,
    minhash_index,
)


def _existing_index(spark: SparkSession, index_dir: str, like: DataFrame) -> DataFrame:
    try:
        # epoch partition-discovery column dropped: the index schema is
        # exactly the minhash_index row shape
        return spark.read.parquet(index_dir).select(*like.columns)
    except Exception:
        return spark.createDataFrame([], like.schema)


def admit_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_dir: str,
    *,
    num_hashes: int = 12,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    min_agree: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Core step shared by the stream and any backfill job: returns
    ``(verdicts, additions)`` for one batch against the stored index.
    ``verdicts`` adds an ``admitted`` flag to the
    incremental_near_duplicates output; ``additions`` are the band rows
    to append."""
    new_idx = minhash_index(
        batch_docs,
        num_hashes=num_hashes,
        rows_per_band=rows_per_band,
        shingle_n=shingle_n,
    )
    existing = _existing_index(spark, index_dir, new_idx)
    raw = incremental_near_duplicates(
        existing, new_idx, num_hashes=num_hashes, min_agree=min_agree
    )
    batch_ids = (
        new_idx.select(F.col("doc_id").alias("match_id"))
        .distinct()
        .withColumn("__in_batch", F.lit(True))
    )
    verdicts = raw.join(batch_ids, "match_id", "left").select(
        "new_id",
        "match_id",
        "n_agree",
        "est_jaccard",
        "is_dup",
        (
            (~F.col("is_dup"))
            | (
                F.coalesce("__in_batch", F.lit(False))
                & (F.col("new_id") < F.col("match_id"))
            )
        ).alias("admitted"),
    )
    additions = new_idx.join(
        verdicts.filter("admitted").select(F.col("new_id").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    return verdicts, additions


def run_streaming_dedup_index(
    spark: SparkSession,
    docs_stream_dir: str,
    index_dir: str,
    verdicts_dir: str,
    checkpoint_dir: str,
    **dedup_kwargs,
) -> None:
    """Stream document files → per-epoch dedup verdicts + index
    additions. Runs to completion on the available files
    (processAllAvailable) and stops; re-running picks up new files from
    the checkpoint."""
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_stream_dir)
    )

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        verdicts, additions = admit_batch(
            spark, batch_df.select("doc_id", "text"), index_dir, **dedup_kwargs
        )
        # materialize BOTH results against the pre-epoch index snapshot
        # BEFORE writing into index_dir — the additions DAG reads the
        # very directory the epoch write lands in
        verdicts = verdicts.persist()
        additions = additions.persist()
        try:
            verdicts.count(), additions.count()
            verdicts.write.mode("overwrite").parquet(
                f"{verdicts_dir}/epoch={epoch_id}"
            )
            additions.write.mode("overwrite").parquet(
                f"{index_dir}/epoch={epoch_id}"
            )
        finally:
            verdicts.unpersist()
            additions.unpersist()

    q = (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def read_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """The live index: union of all epoch partitions."""
    return spark.read.parquet(index_dir)


# --- streaming perceptual (image) dedup (round 9, VERDICT r8 Next #7) ---------


def admit_image_batch(
    spark: SparkSession,
    batch_pay: DataFrame,
    index_dir: str,
    *,
    grid: int = 9,
    word_bits: int = 36,
    band_bits: int = 12,
    max_hamming: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """One image micro-batch against the persisted fingerprint index:
    decode → multi-word dHash (72-bit wide bands by default — the q142
    scale path), probe via dedup.multiword_hamming_matches, admit a doc
    iff it has NO near-dup in the index and NO lower-id near-dup in its
    own batch (min-id canonical survivor — the image counterpart of
    :func:`admit_batch`'s rule). Returns ``(verdicts, additions)``;
    ``verdicts`` is (doc_id, n_matches, best_hamming, admitted),
    ``additions`` the fingerprint rows to fold into the index. The
    index holds only (doc_id, w0..w{n-1}) BIGINTs — pixels never leave
    the decode map stage, ~24 B/doc state."""
    from openstack_billing_from_db_spark.operators import multimodal
    from openstack_billing_from_db_spark.operators.dedup import (
        multiword_hamming_matches,
    )

    bits = grid * (grid - 1)
    n_words = -(-bits // word_bits)
    new_fp = multimodal.dhash_multiword_images(
        batch_pay, grid=grid, word_bits=word_bits
    )
    existing = _existing_index(spark, index_dir, new_fp)
    matches = multiword_hamming_matches(
        existing,
        new_fp,
        n_words=n_words,
        word_bits=word_bits,
        band_bits=band_bits,
        max_hamming=max_hamming,
    )
    blocking = F.when(
        (~F.col("match_in_new")) | (F.col("match_id") < F.col("new_id")),
        1,
    ).otherwise(0)
    per_doc = matches.groupBy(F.col("new_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("hamming").alias("best_hamming"),
        (F.sum(blocking) == 0).alias("admitted"),
    )
    verdicts = (
        new_fp.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            "best_hamming",
            F.coalesce("admitted", F.lit(True)).alias("admitted"),
        )
    )
    additions = new_fp.join(
        verdicts.filter("admitted").select("doc_id"), "doc_id", "left_semi"
    )
    return verdicts, additions


def run_streaming_image_dedup(
    spark: SparkSession,
    images_stream_dir: str,
    index_dir: str,
    verdicts_dir: str,
    checkpoint_dir: str,
    **dedup_kwargs,
) -> None:
    """Stream image-payload files → per-epoch perceptual-dedup verdicts
    + fingerprint-index additions, with the same ``epoch=<id>``
    overwrite idempotency as :func:`run_streaming_dedup_index` (a
    replayed micro-batch rewrites its own partition)."""
    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(images_stream_dir)
    )

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        verdicts, additions = admit_image_batch(
            spark,
            batch_df.select("doc_id", "payload"),
            index_dir,
            **dedup_kwargs,
        )
        verdicts = verdicts.persist()
        additions = additions.persist()
        try:
            # materialize BOTH against the pre-epoch index snapshot
            # BEFORE the epoch write lands in index_dir
            verdicts.count(), additions.count()
            verdicts.write.mode("overwrite").parquet(
                f"{verdicts_dir}/epoch={epoch_id}"
            )
            additions.write.mode("overwrite").parquet(
                f"{index_dir}/epoch={epoch_id}"
            )
        finally:
            verdicts.unpersist()
            additions.unpersist()

    q = (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
