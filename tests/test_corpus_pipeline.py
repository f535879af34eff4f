"""End-to-end corpus preparation: filter → dedup → near-dedup → langid →
partitioned parquet sink, with partition pruning verified on read-back."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from openstack_billing_from_db_spark.plans.corpus_pipeline import (
    corpus_stats,
    prepare_corpus,
)


def test_prepare_corpus(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    corpus = prepare_corpus(spark, sf_dir, out)
    n = corpus.count()
    docs_in = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert 0 < n <= docs_in

    # no exact duplicates survive
    assert corpus.groupBy(F.md5("text")).count().filter("count > 1").count() == 0

    # stats are well-formed
    stats = {r.predicted_lang: r for r in corpus_stats(corpus).collect()}
    assert sum(r.n_docs for r in stats.values()) == n
    assert all(r.n_tokens > 0 for r in stats.values())

    # the sink is hive-partitioned by predicted language
    parts = [d for d in os.listdir(out) if d.startswith("predicted_lang=")]
    assert parts, os.listdir(out)

    # partition pruning: a language filter reaches PartitionFilters
    back = spark.read.parquet(out).filter(F.col("predicted_lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(predicted_lang" in plan, plan
    assert back.count() == (stats["en"].n_docs if "en" in stats else 0)


def test_quality_filter_drops_low_quality(spark, sf_dir):
    strict = prepare_corpus(spark, sf_dir, None, min_quality=0.9)
    loose = prepare_corpus(spark, sf_dir, None, min_quality=0.0)
    assert strict.count() <= loose.count()


def test_image_dedup_stage_keeps_family_canonicals(spark, sf_dir):
    """The image stage drops exactly the higher-id members of each
    perceptual near-dup family and keeps every family's lowest-id
    member (same canonical-survivor rule as the text stages), and the
    image_deduped observation rides the dry-run pass."""
    from pyspark.sql import Observation

    from openstack_billing_from_db_spark.operators import multimodal
    from openstack_billing_from_db_spark.plans.corpus_pipeline import (
        IMAGE_STAGE,
        image_dedup_stage,
        prepare_corpus,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    survivors = {r.doc_id for r in image_dedup_stage(docs).collect()}
    pairs = multimodal.phash_near_duplicates(
        multimodal.synthesize_textured_image_payloads(docs)
    ).collect()
    dropped = {r.doc_b for r in pairs}
    all_ids = {r.doc_id for r in docs.collect()}
    assert survivors == all_ids - dropped
    # every pair's lower-id side survives unless itself dropped by an
    # even lower id — so each near-dup family keeps >= 1 member
    assert all(
        r.doc_a in survivors or r.doc_a in dropped for r in pairs
    )
    assert survivors

    obs: dict[str, Observation] = {}
    out = prepare_corpus(
        spark, sf_dir, None, image_dedup=True, observations=obs
    )
    n = out.count()
    assert IMAGE_STAGE in obs
    assert int(obs[IMAGE_STAGE].get["n"]) == n
    assert n <= int(obs["near_deduped"].get["n"])
