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


def test_audio_video_dedup_stages_and_content_keys(spark, sf_dir):
    """The audio/video stages (VERDICT r9 Next #5) follow the image
    stage's canonical-survivor contract, their observations ride the
    dry-run pass, and the per-modality content-key divisors give each
    modality its own duplicate structure so EVERY composed stage has
    real drops to make (the q146 design): with divisors (1, 2, 3) the
    audio and video stages each drop a non-empty set from the previous
    stage's survivors."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from openstack_billing_from_db_spark.operators import multimodal
    from openstack_billing_from_db_spark.plans.corpus_pipeline import (
        AUDIO_STAGE,
        VIDEO_STAGE,
        audio_dedup_stage,
        prepare_corpus,
        video_dedup_stage,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    all_ids = {r.doc_id for r in docs.collect()}

    # stage contract vs the production pair kernel, content key honored
    for stage, pairs_fn, synth, div in (
        (
            audio_dedup_stage,
            multimodal.audio_near_duplicates,
            multimodal.synthesize_family_audio_payloads,
            2,
        ),
        (
            video_dedup_stage,
            multimodal.video_near_duplicates,
            multimodal.synthesize_family_video_payloads,
            3,
        ),
    ):
        survivors = {
            r.doc_id for r in stage(docs, synth_id_div=div).collect()
        }
        src = docs.select(
            "doc_id", F.expr(f"doc_id div {div}").alias("__synth")
        )
        dropped = {
            r.doc_b
            for r in pairs_fn(synth(src, synth_col="__synth")).collect()
        }
        assert survivors == all_ids - dropped and dropped
        # consecutive ids share a content key -> exact duplicates, so
        # at least every odd/`div`-tail id in a full block is dropped
        assert survivors < all_ids

    # composed: every modality stage drops something at these divisors
    obs: dict[str, Observation] = {}
    out = prepare_corpus(
        spark,
        sf_dir,
        None,
        image_dedup=True,
        audio_dedup=True,
        audio_synth_id_div=2,
        video_dedup=True,
        video_synth_id_div=3,
        observations=obs,
    )
    n = out.count()
    n_img = int(obs["image_deduped"].get["n"])
    n_aud = int(obs[AUDIO_STAGE].get["n"])
    n_vid = int(obs[VIDEO_STAGE].get["n"])
    assert n == n_vid < n_aud < n_img  # every modality stage bites
