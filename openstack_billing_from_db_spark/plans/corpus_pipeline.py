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
      → [audio near-dedup]        (optional: WAV decode → delta-energy
                                   hash → tuned banded hamming —
                                   multimodal.audio_near_duplicates)
      → [video near-dedup]        (optional: RVID index walk decodes only
                                   sampled frames → frame-majority banded
                                   pairs — multimodal.video_near_duplicates)
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
second scan per stage; each enabled modality stage additionally runs
one build-time job to materialize its drop set, see
``_materialized_drops``). The registered q128 proves the text chain,
q143 text+image, and q146 the full text+image+audio+video composition,
each against a single DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.operators import dedup, text
from openstack_billing_from_db_spark.sources.tables import load_table

# stage names, pipeline order — keys of the ``observations`` dict
STAGES = ("input", "quality_kept", "exact_canon", "near_deduped")
# appended to the observation keys when the matching flag is on
IMAGE_STAGE = "image_deduped"
AUDIO_STAGE = "audio_deduped"
VIDEO_STAGE = "video_deduped"


def _materialized_drops(pairs: DataFrame) -> DataFrame:
    """Eagerly localCheckpoint a modality stage's drop set (the doc_b
    side of its verified pairs). The drop set is tiny (duplicate ids
    only) but its LINEAGE is not: the banded self-join references the
    synthesized-payload branch twice, so with k chained modality stages
    the recipe's logical plan held ~3^k copies of the upstream pipeline
    — enough to OOM the driver's plan-string rendering at three stages.
    Truncating here makes plan growth linear in the stage count; each
    stage already runs a build-time job for its banding tuner count, so
    the eager materialization adds no new execution phase. At 100 TB
    this is the natural stage barrier: the drop set is the one
    artifact worth materializing between modality passes."""
    return pairs.select(
        F.col("doc_b").alias("doc_id")
    ).distinct().localCheckpoint(eager=True)


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

    if n_docs is None:
        # count the NARROW projection: phash_near_duplicates' fallback
        # would count the payload DataFrame, re-running the synthesis
        # mapInPandas once just for the tuner's cardinality
        n_docs = corpus.select("doc_id").count()
    pay = multimodal.synthesize_textured_image_payloads(
        corpus.select("doc_id")
    )
    pairs = multimodal.phash_near_duplicates(
        pay, n_docs=n_docs, max_hamming=max_hamming
    )
    drops = _materialized_drops(pairs)
    return corpus.join(drops, "doc_id", "left_anti")


def audio_dedup_stage(
    corpus: DataFrame,
    *,
    max_hamming: int = 4,
    n_docs: int | None = None,
    synth_id_div: int = 1,
) -> DataFrame:
    """Audio perceptual-dedup stage (VERDICT r9 Next #5): synthesize
    each surviving doc's WAV clip, decode → 56-bit delta-energy hash →
    banded hamming pairs at the corpus-size-tuned width
    (multimodal.audio_near_duplicates), drop the higher-id member of
    every verified pair. PCM lives only inside the stage's map tasks.

    ``synth_id_div`` keys the FIXTURE content off ``doc_id //
    synth_id_div`` while rows stay keyed on the true doc_id: a distinct
    divisor per modality gives each stage its own duplicate structure
    (docs whose images differ can still be exact audio duplicates), so
    every composed stage has real drops to make — as in real corpora
    where modalities duplicate independently."""
    from openstack_billing_from_db_spark.operators import multimodal

    src = corpus.select(
        "doc_id", F.expr(f"doc_id div {int(synth_id_div)}").alias("__synth")
    )
    if n_docs is None:
        n_docs = src.count()  # narrow — avoids the payload-synthesis count
    pay = multimodal.synthesize_family_audio_payloads(
        src, synth_col="__synth"
    )
    pairs = multimodal.audio_near_duplicates(
        pay, n_docs=n_docs, max_hamming=max_hamming
    )
    drops = _materialized_drops(pairs)
    return corpus.join(drops, "doc_id", "left_anti")


def video_dedup_stage(
    corpus: DataFrame,
    *,
    max_hamming: int = 4,
    min_frames: int = 2,
    n_docs: int | None = None,
    synth_id_div: int = 1,
) -> DataFrame:
    """Video perceptual-dedup stage (VERDICT r9 Next #5): synthesize
    each surviving doc's RVID clip, index-walk-decode only the sampled
    frames → per-frame dHash → frame-majority banded pairs at the
    corpus-size-tuned width (multimodal.video_near_duplicates), drop
    the higher-id member of every ≥ ``min_frames``-frame match. Video
    bytes live only inside the stage's map tasks. ``synth_id_div``: see
    :func:`audio_dedup_stage`."""
    from openstack_billing_from_db_spark.operators import multimodal

    src = corpus.select(
        "doc_id", F.expr(f"doc_id div {int(synth_id_div)}").alias("__synth")
    )
    if n_docs is None:
        n_docs = src.count()  # narrow — avoids the payload-synthesis count
    pay = multimodal.synthesize_family_video_payloads(
        src, synth_col="__synth"
    )
    pairs = multimodal.video_near_duplicates(
        pay, n_docs=n_docs, max_hamming=max_hamming, min_frames=min_frames
    )
    drops = _materialized_drops(pairs)
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
    audio_dedup: bool = False,
    audio_max_hamming: int = 4,
    audio_synth_id_div: int = 1,
    video_dedup: bool = False,
    video_max_hamming: int = 4,
    video_min_frames: int = 2,
    video_synth_id_div: int = 1,
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
    consumer.

    EAGER-EXECUTION SIDE EFFECT (ADVICE r12 #4): the canon cache is
    filled with a blocking ``count()`` at plan-construction time (the
    concurrent-first-reader fix), so calling this function executes the
    scan+quality+window chain even for plan-only consumers — and that
    count is the first action, fixing the input/quality_kept/exact_canon
    observation values. Results are unaffected (the counts are
    identical); explain-only callers pay one real job."""

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

    # Eagerly fill the canon cache BEFORE its fan-out (guide §1/§5, the
    # q123 pattern): the first action over the pipeline contains several
    # INDEPENDENT AQE query stages rooted at canon (the minhash signature
    # chain, both banded self-join sides, the verify rejoin, the final
    # anti-join), and concurrent first readers of a lazy persist do not
    # wait for each other's fill — the measured q146 profile showed four
    # concurrent jobs each re-scanning documents and re-running the
    # quality+window chain (74+52+49+42 s of task time for one 74 s
    # chain), saturating all 32 cores for ~7 s and making the query's
    # wall time swing with scheduler timing. One blocking count fills
    # the cache exactly once; every racing subtree then starts from the
    # cached rows.
    canon.count()
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
    if audio_dedup:
        deduped = tracked_persist(deduped)
        deduped = _observe(
            audio_dedup_stage(
                deduped,
                max_hamming=audio_max_hamming,
                synth_id_div=audio_synth_id_div,
            ),
            AUDIO_STAGE,
        )
    if video_dedup:
        deduped = tracked_persist(deduped)
        deduped = _observe(
            video_dedup_stage(
                deduped,
                max_hamming=video_max_hamming,
                min_frames=video_min_frames,
                synth_id_div=video_synth_id_div,
            ),
            VIDEO_STAGE,
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
