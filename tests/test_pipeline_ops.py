"""Unit tests for the training-data pipeline operators on constructed
inputs (the oracle suite covers them on real testdata; these pin the
semantics on hand-built edge cases)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.operators import dedup, multimodal, similarity


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_duplicates(spark):
    docs = _docs(spark, ["a b c", "a b c", "x y z", "a b c"])
    out = {r.content_hash: r for r in dedup.exact_duplicates(docs).collect()}
    assert len(out) == 2
    dup = [r for r in out.values() if r.n_copies == 3][0]
    assert dup.canonical_id == 0


def test_minhash_finds_planted_near_duplicate(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words in this other document about spark engines"
    docs = _docs(spark, [base, near, far])
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in dedup.minhash_near_duplicates(docs).collect()}
    assert (0, 1) in pairs
    assert pairs[(0, 1)] > 0.5
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_minhash_short_docs_excluded(spark):
    docs = _docs(spark, ["one two", "one two", "x"])
    assert dedup.minhash_near_duplicates(docs).collect() == []


def test_simhash_identical_docs_zero_hamming(spark):
    docs = _docs(spark, ["alpha beta gamma delta", "alpha beta gamma delta", "unrelated totally different thing"])
    fp = dedup.simhash(docs)
    pairs = dedup.simhash_near_duplicates(fp).collect()
    assert {(r.doc_a, r.doc_b, r.hamming) for r in pairs} >= {(0, 1, 0)}


def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 8).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.brute_force_topk(emb, n_queries=2, k=3).collect()
    got = {(r.query_id, r.rn): r.neighbor_id for r in out}

    v = vecs.astype("float64")
    norms = np.sqrt((v * v).sum(axis=1))
    for q in range(2):
        cos = (v @ v[q]) / (norms * norms[q])
        order = sorted(
            (i for i in range(30) if i != q), key=lambda i: (-cos[i], i)
        )[:3]
        for rank, nb in enumerate(order, start=1):
            assert got[(q, rank)] == nb


def test_lsh_topk_subset_of_bucket(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = rng.randn(50, 64).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.lsh_topk(emb, n_queries=3, k=5).collect()
    # ranks are dense per query and neighbors never include the query
    by_q = {}
    for r in out:
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r.rn)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_multimodal_meta_matches_hashlib(spark):
    docs = _docs(spark, ["hello", "héllo wörld"])
    out = {
        r.doc_id: r
        for r in multimodal.extract_payload_meta(
            multimodal.attach_payload(docs)
        ).collect()
    }
    for i, t in enumerate(["hello", "héllo wörld"]):
        assert out[i].n_bytes == len(t.encode("utf-8"))
        assert out[i].content_hash == hashlib.md5(t.encode("utf-8")).hexdigest()


def test_decode_images_compressed_format_gate_raises(spark):
    """BMP/PPM decode is real (test_media_codecs.py); payloads in formats
    only PIL could handle still raise when PIL is absent."""
    docs = multimodal.attach_payload(_docs(spark, ["not an image"]))
    plan = multimodal.decode_images(docs)
    if multimodal._pil_available():
        pytest.skip("PIL present; stub path not active")
    with pytest.raises(Exception) as excinfo:
        plan.collect()
    assert "NotImplementedError" in str(excinfo.value) or isinstance(
        excinfo.value, NotImplementedError
    )


def test_frame_offsets(spark):
    df = spark.createDataFrame([(1, 8000)], "doc_id long, duration_ms long")
    row = multimodal.sample_frame_offsets(df, n_frames=4).collect()[0]
    assert row.frame_offsets_ms == [0, 2000, 4000, 6000]


def test_quality_score_bounds(spark, sf_dir):
    from openstack_billing_from_db_spark.operators.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = docs.select(quality_score(F.col("text")).alias("q")).filter(
        (F.col("q") < 0) | (F.col("q") > 1) | F.col("q").isNull()
    )
    assert bad.count() == 0


def test_asof_join_inner_drops_unmatched(spark):
    from datetime import datetime

    from openstack_billing_from_db_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10)), (2, datetime(2024, 1, 1, 9))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9, 30), "a")], "k long, rts timestamp, v string"
    )
    inner = as_of_join(
        left, right, key="k", left_ts="ts", right_ts="rts",
        right_value_cols=["v"], how="inner",
    ).collect()
    assert [(r.k, r.asof_v) for r in inner] == [(1, "a")]
    outer = as_of_join(
        left, right, key="k", left_ts="ts", right_ts="rts",
        right_value_cols=["v"],
    ).collect()
    assert {(r.k, r.asof_v) for r in outer} == {(1, "a"), (2, None)}


def test_bucket_cap_drops_boilerplate_keeps_normal_pairs(spark):
    """max_bucket_size: a giant exact-dup (boilerplate) family lands in
    oversized LSH buckets and must emit NO pairs, while a small near-dup
    pair in normal buckets is unaffected; cap >= corpus is identical to
    no cap."""
    from openstack_billing_from_db_spark.operators.dedup import (
        minhash_near_duplicates,
        simhash,
        simhash_near_duplicates,
    )

    boiler = "terms of service apply to all content on this site always"
    rows = [(i, boiler) for i in range(40)]  # 40 identical docs
    rows += [
        (100, "the quick brown fox jumps over the lazy dog today ok"),
        (101, "the quick brown fox jumps over the lazy dog today yes"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {
        (r.doc_a, r.doc_b)
        for r in minhash_near_duplicates(docs).filter("jaccard >= 0.5").collect()
    }
    assert (100, 101) in uncapped
    assert sum(1 for a, b in uncapped if a < 40 and b < 40) == 40 * 39 // 2

    capped = {
        (r.doc_a, r.doc_b)
        for r in minhash_near_duplicates(docs, max_bucket_size=10)
        .filter("jaccard >= 0.5")
        .collect()
    }
    assert (100, 101) in capped  # normal pair untouched
    assert not any(a < 40 and b < 40 for a, b in capped)  # boilerplate gone

    # a cap larger than every bucket is a no-op (identical output)
    loose = {
        (r.doc_a, r.doc_b)
        for r in minhash_near_duplicates(docs, max_bucket_size=10_000)
        .filter("jaccard >= 0.5")
        .collect()
    }
    assert loose == uncapped

    fps = simhash(docs)
    sim_uncapped = {
        (r.doc_a, r.doc_b) for r in simhash_near_duplicates(fps).collect()
    }
    sim_capped = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_duplicates(fps, max_bucket_size=10).collect()
    }
    assert not any(a < 40 and b < 40 for a, b in sim_capped)
    assert sim_capped <= sim_uncapped
    sim_loose = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_duplicates(fps, max_bucket_size=10_000).collect()
    }
    assert sim_loose == sim_uncapped


def test_embedding_bucket_cap(spark):
    """max_bucket_size on embedding_near_duplicates: a giant identical-
    vector family emits no pairs, a distinct near-dup pair survives, and
    a loose cap is identical to no cap (n_tables=2 exercises the
    cap-aware first-matching-table emission)."""
    from openstack_billing_from_db_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    dims = 8
    big = [1.0] + [0.0] * (dims - 1)
    rows = [(i, big) for i in range(30)]  # 30 identical vectors
    rows += [
        (100, [0.0, 1.0, 0.1] + [0.0] * (dims - 3)),
        (101, [0.0, 1.0, 0.12] + [0.0] * (dims - 3)),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def pairs(**kw):
        return {
            (r.vec_a, r.vec_b)
            for r in embedding_near_duplicates(
                emb, threshold=0.9, n_planes=4, dims=dims, n_tables=2, **kw
            ).collect()
        }

    uncapped = pairs()
    assert (100, 101) in uncapped
    assert sum(1 for a, b in uncapped if a < 30 and b < 30) == 30 * 29 // 2

    capped = pairs(max_bucket_size=8)
    assert (100, 101) in capped
    assert not any(a < 30 and b < 30 for a, b in capped)

    assert pairs(max_bucket_size=10_000) == uncapped


# --- RRF fusion (round 6) ----------------------------------------------------


def test_rrf_fuse_integer_contributions_and_absent_items(spark):
    from openstack_billing_from_db_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long"
    )
    vec = spark.createDataFrame(
        [(11, 1), (13, 2)], "doc_id long, rank long"
    )
    out = {r.doc_id: r for r in rrf_fuse([lex, vec], k0=60, topk=10).collect()}
    # doc 11 appears in both lists: 1e6//62 + 1e6//61
    assert out[11].rrf_micro == 1_000_000 // 62 + 1_000_000 // 61
    assert out[10].rrf_micro == 1_000_000 // 61  # lex only
    assert out[13].rrf_micro == 1_000_000 // 62  # vec only
    assert out[11].rank == 1  # two medium ranks beat one top rank
    # tie between 10 (lex rank 1) is broken ... check full order
    order = sorted(out.values(), key=lambda r: r.rank)
    assert [r.doc_id for r in order] == [11, 10, 12, 13] or [
        r.doc_id for r in order
    ] == [11, 10, 13, 12]
    # 12 (1e6//63=15873) vs 13 (1e6//62=16129): 13 outranks 12
    assert out[13].rank < out[12].rank

    import pytest

    with pytest.raises(ValueError):
        rrf_fuse([], topk=5)
    with pytest.raises(ValueError):
        rrf_fuse([lex], k0=-1)


# --- DoReMi domain reweighting (round 6) -------------------------------------


def test_doremi_weights_exact_integer_arithmetic(spark):
    import math

    from openstack_billing_from_db_spark.operators.sampling import (
        doremi_domain_weights,
    )

    kl = spark.createDataFrame(
        [("a", 100, 0), ("b", 200, 10_000), ("c", 300, 20_000)],
        "source string, n_tokens long, kl_micro long",
    )
    out = {
        r.source: r.weight_micro
        for r in doremi_domain_weights(
            kl, eta_per_nat=100, smooth_micro=100_000
        ).collect()
    }
    # replay the documented arithmetic: one exp rounded to nano-units,
    # then pure integer floor-div
    e = {g: math.floor(math.exp(k * 100 / 1e6) * 1e9 + 0.5)
         for g, k in (("a", 0), ("b", 10_000), ("c", 20_000))}
    s = sum(e.values())
    for g in e:
        w = e[g] * 1_000_000 // s
        assert out[g] == (900_000 * w + 100_000 * (1_000_000 // 3)) // 1_000_000
    # higher KL -> higher weight; smoothing keeps the floor above c/n * (1-eps)
    assert out["c"] > out["b"] > out["a"]
    assert sum(out.values()) <= 1_000_000


def test_leakage_free_split_no_cluster_straddles(spark, sf_dir):
    """The q133 property stated structurally: every near-dup cluster's
    docs land in ONE split (split is a function of the cluster key)."""
    from openstack_billing_from_db_spark.functions.hashing import seeded_hash64
    from openstack_billing_from_db_spark.operators import dedup, graph
    from openstack_billing_from_db_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(
        docs, num_hashes=16, rows_per_band=4, shingle_n=3
    ).filter(F.col("jaccard") >= 0.5)
    clusters = graph.dedup_clusters(pairs)
    keyed = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .withColumn("ck", F.coalesce("cluster_id", "doc_id"))
    )
    bucket = seeded_hash64(F.col("ck").cast("string"), "cluster-split") % 100
    per_doc = keyed.withColumn(
        "split",
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test")),
    )
    straddlers = (
        per_doc.groupBy("ck")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0
    # and the multi-doc clusters exist at this SF, so the property is
    # non-vacuous
    assert clusters.count() > 0


# --- quality-canonical survivors + mixture epoch (round 6) -------------------


def test_quality_score_micro_tracks_double_score(spark, sf_dir):
    """The integer score is the double heuristic on a 1e-6 floor grid:
    micro/1e6 must sit within 3 floor-steps of the double score."""
    from openstack_billing_from_db_spark.operators.text import (
        quality_score,
        quality_score_micro,
    )
    from openstack_billing_from_db_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").limit(200)
    rows = docs.select(
        quality_score(F.col("text")).alias("qd"),
        quality_score_micro(F.col("text")).alias("qm"),
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.qm <= 1_000_000
        assert abs(r.qm / 1e6 - r.qd) < 3e-6, (r.qm, r.qd)


def test_keep_best_per_cluster_argmax_and_ties(spark):
    from openstack_billing_from_db_spark.operators.dedup import (
        keep_best_per_cluster,
    )

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (7, 10), (9, 10)],
        "doc_id long, quality_micro long",
    )
    out = {
        r.cluster_id: (r.kept_doc_id, r.kept_score, r.n_docs)
        for r in keep_best_per_cluster(clusters, scores).collect()
    }
    # cluster 1: quality tie 90/90 between 2 and 3 -> lowest id wins
    assert out[1] == (2, 90, 3)
    # cluster 7: tie at 10 -> doc 7
    assert out[7] == (7, 10, 2)


def test_mixture_epoch_budget_split_and_admission(spark):
    from openstack_billing_from_db_spark.operators.sampling import (
        mixture_epoch_sample,
    )
    from openstack_billing_from_db_spark.functions.hashing import seeded_hash64

    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(i, "a" if i < 6 else "b", "w " * (i + 1)) for i in range(12)],
        "doc_id long, source string, text string",
    )
    weights = spark.createDataFrame(
        [("a", 750_000), ("b", 250_000)], "source string, weight_micro long"
    )
    total = 41  # deliberately not a multiple of 1e6/weights
    kept = mixture_epoch_sample(
        docs, weights, total_budget_tokens=total, seed="t"
    ).collect()
    # floor split: a -> 30, b -> 10
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r)
        assert r.budget_tokens == (30 if r.source == "a" else 10)
        assert r.cum_tokens <= r.budget_tokens
    # replay the admission order driver-side
    hashes = {
        r.doc_id: r.h
        for r in docs.select(
            "doc_id", seeded_hash64(F.col("doc_id").cast("string"), "t").alias("h")
        ).collect()
    }
    for src, budget in (("a", 30), ("b", 10)):
        pool = sorted(
            (r for r in docs.collect() if r.source == src),
            key=lambda r: (hashes[r.doc_id], r.doc_id),
        )
        cum, want = 0, set()
        for r in pool:
            n = r.doc_id + 1
            if cum + n > budget:
                break
            cum += n
            want.add(r.doc_id)
        got = {r.id for r in by_src.get(src, [])}
        assert got == want, (src, got, want)


def test_mixture_epoch_pregate_identical_to_exact(spark, sf_dir):
    from openstack_billing_from_db_spark.operators import sampling, text
    from openstack_billing_from_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    kl = text.unigram_kl_divergence(
        docs, group_col="source", text_col="text"
    ).drop("n_terms")
    weights = sampling.doremi_domain_weights(kl)
    exact = sorted(
        tuple(r)
        for r in sampling.mixture_epoch_sample(
            docs, weights, total_budget_tokens=40_000, seed="mix-epoch0"
        ).collect()
    )
    gated = sorted(
        tuple(r)
        for r in sampling.mixture_epoch_sample(
            docs,
            weights,
            total_budget_tokens=40_000,
            seed="mix-epoch0",
            pregate_margin=3.0,
        ).collect()
    )
    assert exact == gated
    assert exact


def test_mixture_epoch_pregate_starved_budget_raises(spark):
    import pytest

    from openstack_billing_from_db_spark.operators.sampling import (
        mixture_epoch_sample,
    )

    docs = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "b", "x y")],
        "doc_id long, source string, text string",
    )
    weights = spark.createDataFrame(
        [("a", 999_999), ("b", 1)], "source string, weight_micro long"
    )
    # b's floor budget is 0 -> the gate cannot hold its superset claim
    with pytest.raises(ValueError, match="budget > 0"):
        mixture_epoch_sample(
            docs, weights, total_budget_tokens=100, seed="t",
            pregate_margin=2.0,
        )
    # exact path handles it: b admits nothing, a fills its share
    out = mixture_epoch_sample(
        docs, weights, total_budget_tokens=100, seed="t"
    ).collect()
    assert {r.source for r in out} == {"a"}


def test_rrf_fuse_accepts_k0_zero(spark):
    """ADVICE r7: k0 = 0 is mathematically valid RRF (the 1-based rank
    assert keeps every denominator >= 1) — the k0 >= 1 narrowing from
    the r6 fix is reverted."""
    from openstack_billing_from_db_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame([(10, 1), (11, 2)], "doc_id long, rank long")
    out = {r.doc_id: r.rrf_micro for r in rrf_fuse([lex], k0=0, topk=5).collect()}
    assert out == {10: 1_000_000 // 1, 11: 1_000_000 // 2}
