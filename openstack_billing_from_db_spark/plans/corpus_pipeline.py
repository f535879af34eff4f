"""End-to-end training-corpus preparation: the composed pipeline the
individual operators exist for.

    documents
      → quality filter            (operators/text.quality_score)
      → exact dedup               (keep canonical doc per content hash)
      → MinHash near-dedup        (drop the higher-id doc of any pair with
                                   Jaccard ≥ threshold)
      → [image near-dedup]        (optional: decode → dHash → banded
                                   hamming pairs with corpus-size-tuned
                                   band width, drop the higher-id member —
                                   multimodal.phash_near_duplicates)
      → language ID               (operators/text.langid)
      → token accounting
      → write parquet partitioned by predicted language

Every stage is a DataFrame transform; the result is also returned as a
DataFrame so callers can extend the DAG instead of re-reading the sink.
At 100 TB: quality filter and langid are map-side; exact dedup is one
hash aggregation; near-dedup cost tracks duplicate density (PLANS.md);
the partitioned write gives downstream consumers partition pruning on
language.

Operational entry point: ``corpus_cli prepare`` (with ``--dry-run`` for
stage-by-stage survivor counts riding ``df.observe`` — one action, no
second scan per stage). The registered q128 proves the whole chain
against a single DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.operators import dedup, text
from openstack_billing_from_db_spark.sources.tables import load_table

# stage names, pipeline order — keys of the ``observations`` dict
STAGES = ("input", "quality_kept", "exact_canon", "near_deduped")
# appended to the observation keys when image_dedup=True
IMAGE_STAGE = "image_deduped"


def image_dedup_stage(
    corpus: DataFrame,
    *,
    max_hamming: int = 4,
    n_docs: int | None = None,
) -> DataFrame:
    """Perceptual image-dedup stage for the composed recipe (VERDICT r8
    Next #4): synthesize each surviving doc's image payload, decode →
    dHash → banded hamming pairs via multimodal.phash_near_duplicates —
    the corpus-size-driven entry point, so the recipe gets the 56-bit
    single-word banding on small corpora and the 72-bit two-word
    wide-band path (q142's scale lever) automatically past the
    saturation boundary — then drop the higher-id member of every
    verified pair (the same canonical-survivor rule as the text
    stages). Payloads live only inside the stage's map tasks (narrow
    (doc_id, hash) rows after decode; pixels never shuffle)."""
    from openstack_billing_from_db_spark.operators import multimodal

    pay = multimodal.synthesize_textured_image_payloads(
        corpus.select("doc_id")
    )
    pairs = multimodal.phash_near_duplicates(
        pay, n_docs=n_docs, max_hamming=max_hamming
    )
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return corpus.join(drops, "doc_id", "left_anti")


def prepare_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    *,
    min_quality: float = 0.3,
    near_dup_jaccard: float = 0.8,
    image_dedup: bool = False,
    image_max_hamming: int = 4,
    observations: dict[str, Observation] | None = None,
) -> DataFrame:
    """Returns the cleaned corpus DataFrame (and writes it partitioned by
    predicted language when ``out_dir`` is given).

    Pass an empty dict as ``observations`` to receive one
    ``pyspark.sql.Observation`` per ``STAGES`` entry: each stage's
    survivor count rides the SAME action that materializes the result
    (``df.observe`` accumulates during the pass — no second scan per
    stage). Read ``observations[stage].get["n"]`` AFTER an action has
    run the plan; ``corpus_cli prepare --dry-run`` is the packaged
    consumer."""

    def _observe(df: DataFrame, stage: str) -> DataFrame:
        if observations is None:
            return df
        obs = Observation(f"corpus_{stage}")
        observations[stage] = obs
        return df.observe(obs, F.count(F.lit(1)).alias("n"))

    docs = _observe(load_table(spark, sf_dir, "documents"), "input")

    scored = docs.withColumn("quality_score", text.quality_score(F.col("text")))
    kept = _observe(
        scored.filter(F.col("quality_score") >= min_quality), "quality_kept"
    )

    # exact dedup: keep the canonical (min doc_id) copy of each content
    # hash. Persisted: canon feeds BOTH the minhash pair generation and
    # the final anti-join (one scan instead of two), and a persisted
    # node also guarantees the stage observations upstream of it fire
    # exactly once per action (a re-computed branch would re-accumulate
    # observe counts). Released by release_operator_caches().
    from openstack_billing_from_db_spark.operators.caching import (
        tracked_persist,
    )

    canon = tracked_persist(
        _observe(
            kept.withColumn("content_hash", F.md5("text"))
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("content_hash").orderBy("doc_id")
                ),
            )
            .filter(F.col("rn") == 1)
            .drop("rn", "content_hash"),
            "exact_canon",
        )
    )

    # near-dedup: drop the higher-id member of each confirmed near-dup pair
    pairs = dedup.minhash_near_duplicates(canon).filter(
        F.col("jaccard") >= near_dup_jaccard
    )
    to_drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    deduped = _observe(canon.join(to_drop, "doc_id", "left_anti"), "near_deduped")

    if image_dedup:
        # persisted: the stage input feeds the count() the banding
        # tuner needs, the payload synthesis, and the anti-join
        deduped = tracked_persist(deduped)
        deduped = _observe(
            image_dedup_stage(deduped, max_hamming=image_max_hamming),
            IMAGE_STAGE,
        )

    enriched = deduped.select(
        "*",
        text.langid(F.col("text")).alias("predicted_lang"),
        text.token_count(F.col("text")).alias("n_tokens"),
        text.fingerprint(F.col("text")).alias("fingerprint"),
    )

    if out_dir:
        enriched.write.mode("overwrite").partitionBy("predicted_lang").parquet(out_dir)
    return enriched


def corpus_stats(corpus: DataFrame) -> DataFrame:
    return corpus.groupBy("predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.avg("quality_score").alias("avg_quality"),
    )
