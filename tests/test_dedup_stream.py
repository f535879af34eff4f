"""Streaming incremental dedup (streaming/dedup_stream.py): batches of
document files judged against the growing persisted signature index;
only canonical survivors enter it."""

from __future__ import annotations

from pyspark.sql import functions as F

from openstack_billing_from_db_spark.streaming.dedup_stream import (
    admit_batch,
    read_index,
    run_streaming_dedup_index,
)

D1 = "the quick brown fox jumps over the lazy dog today"
D2 = "completely different words about spark shuffles and joins"
D3 = "an entirely fresh document with novel words in it"


def _write_docs(spark, path, rows):
    # one parquet FILE per batch (the stream source ignores
    # non-partition subdirectories)
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        path,
    )


def test_admit_batch_bootstrap_and_within_batch_family(spark, tmp_path):
    index_dir = str(tmp_path / "idx")
    batch = spark.createDataFrame(
        [(1, D1), (2, D2), (3, D2)],  # 2 & 3 are twins
        "doc_id long, text string",
    )
    verdicts, additions = admit_batch(spark, batch, index_dir)
    v = {r.new_id: r for r in verdicts.collect()}
    # min-id twin is the canonical survivor; the other is a dup of it
    assert v[2].admitted and v[2].is_dup and v[2].match_id == 3
    assert not v[3].admitted and v[3].is_dup and v[3].match_id == 2
    assert v[1].admitted and not v[1].is_dup
    admitted_ids = {r.doc_id for r in additions.select("doc_id").distinct().collect()}
    assert admitted_ids == {1, 2}


def test_streaming_dedup_index_grows_by_uniques_only(spark, tmp_path):
    docs_dir = str(tmp_path / "docs_stream")
    index_dir = str(tmp_path / "idx")
    verdicts_dir = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")

    # batch 1 arrives, is processed, THEN batch 2 lands (two stream runs
    # sharing the checkpoint — the daily-ingest rhythm)
    _write_docs(spark, f"{docs_dir}/b1.parquet", [(1, D1), (2, D2)])
    run_streaming_dedup_index(spark, docs_dir, index_dir, verdicts_dir, ckpt)
    assert {
        r.doc_id for r in read_index(spark, index_dir).select("doc_id").distinct().collect()
    } == {1, 2}

    _write_docs(spark, f"{docs_dir}/b2.parquet", [(10, D1), (11, D3)])
    run_streaming_dedup_index(spark, docs_dir, index_dir, verdicts_dir, ckpt)

    # 10 is a copy of the indexed doc 1 -> rejected; 11 unique -> admitted
    idx_ids = {
        r.doc_id for r in read_index(spark, index_dir).select("doc_id").distinct().collect()
    }
    assert idx_ids == {1, 2, 11}

    verdicts = spark.read.parquet(verdicts_dir)
    v10 = verdicts.filter("new_id = 10").collect()[0]
    assert v10.is_dup and v10.match_id == 1 and not v10.admitted
    # epoch partitioning present (idempotent overwrite layout)
    assert verdicts.select("epoch").distinct().count() >= 2
