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
