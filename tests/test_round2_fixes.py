"""Round-2 fixes pinned: ADVICE.md items (partition-pruning off-by-one,
as-of inner NULL match, to_micros pre-epoch, cache lifecycle, CLI flag)
and VERDICT.md scale-hardening (exploded MinHash verify, adaptive LSH)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from openstack_billing_from_db_spark.operators import dedup, similarity
from openstack_billing_from_db_spark.operators.caching import (
    release_operator_caches,
)
from openstack_billing_from_db_spark.operators.intervals import to_micros
from openstack_billing_from_db_spark.sources.partitioning import (
    read_events_window,
    write_events_partitioned,
)
from openstack_billing_from_db_spark.sources.tables import load_table


# --- ADVICE: partition pruning must not drop the final partial day ----------


def test_window_with_time_of_day_keeps_final_day(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_date")
    events = load_table(spark, sf_dir, "events")
    write_events_partitioned(events, out)

    window = (datetime(2024, 1, 10), datetime(2024, 1, 14, 6, 30))
    scoped = read_events_window(spark, out, *window)
    expected = events.filter(
        (events.ts >= window[0]) & (events.ts < window[1])
    ).count()
    assert scoped.count() == expected
    # the final day genuinely contributes rows (the bug silently dropped it)
    on_final_day = events.filter(
        (events.ts >= datetime(2024, 1, 14)) & (events.ts < window[1])
    ).count()
    assert on_final_day > 0


def test_midnight_window_still_prunes_end_partition(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_date")
    events = load_table(spark, sf_dir, "events")
    write_events_partitioned(events, out)

    scoped = read_events_window(
        spark, out, datetime(2024, 1, 10), datetime(2024, 1, 12)
    )
    dates = {r.event_date.isoformat() for r in scoped.select("event_date").distinct().collect()}
    assert dates <= {"2024-01-10", "2024-01-11"}


# --- ADVICE: as-of inner join with a legitimately-NULL value column ---------


def test_asof_inner_keeps_match_with_null_value(spark):
    from openstack_billing_from_db_spark.operators.asof import as_of_join

    left = spark.createDataFrame([(1, 10), (2, 10)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 5, None), (3, 5, "x")], "k int, ts int, v string"
    )
    inner = as_of_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_value_cols=["v"], how="inner",
    ).collect()
    # k=1 matched a right row whose value is NULL — it must survive
    assert [(r.k, r.asof_v) for r in inner] == [(1, None)]


# --- ADVICE: to_micros pre-epoch fractional seconds -------------------------


def test_to_micros_pre_epoch_fractional():
    t = datetime(1969, 12, 31, 23, 59, 59, 500000, tzinfo=timezone.utc)
    assert to_micros(t) == -500_000
    assert to_micros(datetime(1970, 1, 1)) == 0
    assert to_micros(datetime(1970, 1, 1, 0, 0, 1, 250000)) == 1_250_000


# --- ADVICE: operator caches are releasable ---------------------------------


def test_release_operator_caches(spark):
    docs = spark.createDataFrame(
        [(i, f"one two three four five six {i}") for i in range(20)],
        "doc_id long, text string",
    )
    dedup.minhash_near_duplicates(docs).count()
    assert release_operator_caches() >= 2
    assert release_operator_caches() == 0


def test_cached_broadcast_dedupes_and_releases(spark):
    """ADVICE r5: the Arrow codebook helpers must reuse one broadcast
    per payload instead of leaking a fresh JVM-pinned copy per call."""
    from openstack_billing_from_db_spark.operators.caching import (
        cached_broadcast,
    )

    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return [1.0, 2.0]

    a = cached_broadcast(("t", (1.0, 2.0)), factory)
    b = cached_broadcast(("t", (1.0, 2.0)), factory)
    assert a is b and calls["n"] == 1
    assert cached_broadcast(("t", (3.0,)), lambda: [3.0]) is not a
    assert release_operator_caches() >= 2
    # released → rebuilt on next request, not resurrected
    c = cached_broadcast(("t", (1.0, 2.0)), factory)
    assert c is not a and calls["n"] == 2
    assert c.value == [1.0, 2.0]
    release_operator_caches()


def test_pq_arrow_paths_share_codebook_broadcasts(spark):
    """Building the same Arrow-path PQ encode twice must not register
    two broadcasts for the same codebook content."""
    from openstack_billing_from_db_spark.operators import quantization
    from openstack_billing_from_db_spark.operators.caching import (
        _TRACKED_BC,
        release_operator_caches,
    )

    release_operator_caches()
    # force the Arrow path: >LITERAL_CODEBOOK_MAX_CODES total centroids
    k = quantization.LITERAL_CODEBOOK_MAX_CODES + 1
    cb = [[float(j), float(j + 1)] for j in range(k)]
    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, float(i % 3), 2.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    quantization.pq_encode(emb, [cb, cb]).count()
    n_after_first = len(_TRACKED_BC)
    quantization.pq_encode(emb, [cb, cb]).count()
    assert len(_TRACKED_BC) == n_after_first  # reused, not re-broadcast
    assert release_operator_caches() >= 1


# --- ADVICE/VERDICT: CLI flag round-trip ------------------------------------


def test_upload_primary_flag_round_trip():
    from openstack_billing_from_db_spark.cli import build_parser

    p = build_parser()
    assert p.parse_args([]).upload_to_primary_location is True
    assert (
        p.parse_args(["--no-upload-to-primary-location"]).upload_to_primary_location
        is False
    )


# --- VERDICT: exploded MinHash verify ---------------------------------------


def _near_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(0, base), (1, base + " tail"), (2, "completely different words here entirely now")]
    rows += [(10 + i, f"filler document number {i} with some shared tokens") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_exploded_matches_array_path(spark):
    docs = _near_dup_docs(spark)
    exploded = {
        (r.doc_a, r.doc_b): round(r.jaccard, 12)
        for r in dedup.minhash_near_duplicates(docs).collect()
    }
    arrays = {
        (r.doc_a, r.doc_b): round(r.jaccard, 12)
        for r in dedup.minhash_near_duplicates(docs, verify_via="arrays").collect()
    }
    assert exploded == arrays and (0, 1) in exploded


def test_minhash_exploded_plan_carries_no_shingle_arrays(spark):
    docs = _near_dup_docs(spark)
    plan = (
        dedup.minhash_near_duplicates(docs, verify_via="exploded")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "array_intersect" not in plan
    arr_plan = (
        dedup.minhash_near_duplicates(docs, verify_via="arrays")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "array_intersect" in arr_plan


def test_minhash_auto_picks_by_size(spark, tmp_path):
    """auto → arrays for a small parquet-backed corpus (real file-size
    stats), exploded when the Catalyst estimate crosses the threshold or
    is unknown (in-memory relations report Long.MaxValue)."""
    _near_dup_docs(spark).write.mode("overwrite").parquet(str(tmp_path / "d"))
    small = spark.read.parquet(str(tmp_path / "d"))
    small_plan = (
        dedup.minhash_near_duplicates(small)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "array_intersect" in small_plan  # arrays path chosen

    # unknown-size relation (createDataFrame → Long.MaxValue stats):
    # assume big, take the narrow-row path
    unknown = _near_dup_docs(spark)
    unknown_plan = (
        dedup.minhash_near_duplicates(unknown)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "array_intersect" not in unknown_plan


# --- VERDICT: adaptive LSH width + OR-amplification -------------------------


def test_adaptive_n_planes_tracks_corpus_size():
    widths = [similarity.adaptive_n_planes(n) for n in (100, 10_000, 1_000_000, 10**9)]
    assert widths == sorted(widths), widths
    assert widths[0] == 2  # tiny corpora stay coarse
    assert widths[-1] >= 20  # 1e9 vectors → millions of buckets
    # expected occupancy stays bounded: n / 2^planes <= 2*target
    for n in (10_000, 1_000_000, 10**9):
        planes = similarity.adaptive_n_planes(n)
        assert n / (1 << planes) <= 2 * similarity.TARGET_BUCKET_OCCUPANCY


def _rand_emb(spark, n, seed=7):
    import numpy as np

    vecs = np.random.RandomState(seed).randn(n, 16).astype("float32")
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )


def test_bucket_count_grows_with_corpus(spark):
    small = _rand_emb(spark, 200)
    big = _rand_emb(spark, 2000)

    def n_buckets(emb, n):
        planes = similarity.adaptive_n_planes(n)
        idx = similarity._bucketed_index(emb, "vec_id", "embedding", planes, 16, 1)
        return idx.select("bucket").distinct().count()

    assert n_buckets(big, 50_000) > n_buckets(small, 200)
    release_operator_caches()


def test_or_amplification_is_superset(spark):
    emb = _rand_emb(spark, 120)
    one = {
        (r.vec_a, r.vec_b)
        for r in similarity.embedding_near_duplicates(
            emb, threshold=-1.0, n_planes=4, dims=16, n_tables=1
        ).collect()
    }
    two = {
        (r.vec_a, r.vec_b)
        for r in similarity.embedding_near_duplicates(
            emb, threshold=-1.0, n_planes=4, dims=16, n_tables=2
        ).collect()
    }
    assert one <= two and len(two) > len(one)
    release_operator_caches()


# --- small-input map parallelism (PLANS.md "Small-input parallelism") --------


def test_ensure_map_parallelism_rebalances_single_split(spark, tmp_path):
    from openstack_billing_from_db_spark.operators.parallelism import (
        ensure_map_parallelism,
    )

    spark.range(1000).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "t"))
    one = spark.read.parquet(str(tmp_path / "t"))
    assert one.rdd.getNumPartitions() == 1
    fixed = ensure_map_parallelism(one)
    assert fixed.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # explicit-number repartition: AQE must not coalesce it back down
    assert "REPARTITION_BY_NUM" in fixed._jdf.queryExecution().executedPlan().toString()


def test_ensure_map_parallelism_noop_on_wide_input(spark):
    from openstack_billing_from_db_spark.operators.parallelism import (
        ensure_map_parallelism,
    )

    # big enough (Range stats: 8 B/row) to clear the cheap-rebalance
    # size gate, so the guard takes the partition-count probe path and
    # must return the already-wide input untouched — the 100 TB
    # contract: no exchange added on a well-parallel scan. (Lazy: the
    # probe reads the partition count, nothing executes.)
    wide = spark.range(
        0, 64 << 20, 1, spark.sparkContext.defaultParallelism
    )
    assert ensure_map_parallelism(wide) is wide  # untouched: no exchange added

    # a SMALL under-parallel input is still rebalanced (scan-rooted:
    # via the job-free probe; shuffle-bearing: probe-free — see
    # ensure_map_parallelism)
    small = spark.range(0, 1000, 1, 1)
    assert ensure_map_parallelism(small) is not small
    # a small SHUFFLE-BEARING input takes the probe-free path: the
    # probe would execute the aggregation's shuffle stages just to
    # learn the AQE-coalesced count, which for <=256 MB lands below
    # the rebalance threshold anyway — same decision, minus the probe
    small_shuffled = spark.range(0, 1000).groupBy((F.col("id") % 10).alias("g")).count()
    assert ensure_map_parallelism(small_shuffled) is not small_shuffled


# --- IVF ANN (q65) -----------------------------------------------------------


def test_ivf_full_probe_equals_brute_force(spark):
    """Probing every cell scores every vector: IVF degrades to the exact
    baseline, pinning assignment/probe plumbing against dropped rows."""
    emb = _rand_emb(spark, 300)
    ivf = {
        (r.query_id, r.neighbor_id, r.rn)
        for r in similarity.ivf_topk(
            emb, n_centroids=8, n_probe=8, n_queries=5, k=4
        ).collect()
    }
    brute = {
        (r.query_id, r.neighbor_id, r.rn)
        for r in similarity.brute_force_topk(emb, n_queries=5, k=4).collect()
    }
    assert ivf == brute
    release_operator_caches()


def test_ivf_partial_probe_recall(spark):
    """4-of-16 probing on random vectors: results are a subset of valid
    neighbors and every query still fills k slots from its probed cells."""
    emb = _rand_emb(spark, 400)
    rows = similarity.ivf_topk(
        emb, n_centroids=16, n_probe=4, n_queries=6, k=3
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rn)
    assert set(by_q) == set(range(6))
    for ranks in by_q.values():
        assert sorted(ranks) == [1, 2, 3]
    release_operator_caches()


# --- simhash canonical-band dedup (no distinct exchange) ---------------------


def test_simhash_near_dup_plan_has_no_distinct_exchange(spark):
    """Pairs are emitted from their first matching band only — the plan
    must contain NO aggregate-based dedup over the output pairs."""
    docs = _near_dup_docs(spark)
    fp = dedup.simhash(docs)
    plan = (
        dedup.simhash_near_duplicates(fp)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Deduplicate" not in plan and "Aggregate [doc_a" not in plan
    release_operator_caches()


def test_simhash_near_dup_pairs_unique_and_complete(spark):
    """Canonical-band filter emits each qualifying pair exactly once, and
    exactly the pairs a full join+distinct would emit."""
    import itertools

    docs = _near_dup_docs(spark)
    fp = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    rows = dedup.simhash_near_duplicates(dedup.simhash(docs)).collect()
    got = [(r.doc_a, r.doc_b) for r in rows]
    assert len(got) == len(set(got))  # exactly-once

    mask = (1 << 8) - 1
    want = set()
    for a, b in itertools.combinations(sorted(fp), 2):
        shares_band = any(
            (fp[a] >> (k * 8)) & mask == (fp[b] >> (k * 8)) & mask for k in range(4)
        )
        if shares_band and bin(fp[a] ^ fp[b]).count("1") <= 4:
            want.add((a, b))
    assert set(got) == want
    release_operator_caches()


def test_minhash_candidates_have_no_distinct_exchange(spark):
    """Candidate pairs are emitted from their first matching band only —
    no Deduplicate/Aggregate over (doc_a, doc_b) in the plan."""
    plan = (
        dedup.minhash_near_duplicates(_near_dup_docs(spark), verify_via="arrays")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Deduplicate" not in plan
    release_operator_caches()


def test_or_amplified_plans_have_no_distinct_exchange(spark):
    emb = _rand_emb(spark, 100)
    for df in (
        similarity.embedding_near_duplicates(
            emb, threshold=-1.0, n_planes=4, dims=16, n_tables=2
        ),
        similarity.lsh_topk(emb, n_planes=4, dims=16, n_tables=2, n_queries=3, k=2),
    ):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Deduplicate" not in plan
    release_operator_caches()


def test_cached_broadcast_concurrent_and_lru_bounded(spark):
    """ADVICE r6 #5: get-or-create is serialized (concurrent builders of
    one key share a single broadcast — no leaked racer copies) and the
    cache is LRU-bounded (insertions past BROADCAST_CACHE_MAX destroy
    the least-recently-used entry)."""
    import threading

    from openstack_billing_from_db_spark.operators import caching
    from openstack_billing_from_db_spark.operators.caching import (
        BROADCAST_CACHE_MAX,
        cached_broadcast,
        release_operator_caches,
    )

    release_operator_caches()
    builds = []
    results = []

    def factory():
        builds.append(1)
        return [1.0]

    def worker():
        results.append(cached_broadcast(("race", "k"), factory))

    threads = [threading.Thread(target=worker) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1  # exactly one construction under the lock
    assert all(r is results[0] for r in results)

    # LRU bound: fill past the cap; the oldest entries are evicted
    # (unpersisted), the newest + the re-touched survivor stay live
    release_operator_caches()
    first = cached_broadcast(("lru", 0), lambda: [0.0])
    for i in range(1, BROADCAST_CACHE_MAX):
        cached_broadcast(("lru", i), lambda: [float(i)])
    cached_broadcast(("lru", 0), lambda: [0.0])  # touch key 0 -> MRU
    cached_broadcast(("lru", BROADCAST_CACHE_MAX), lambda: [-1.0])  # evicts key 1
    assert len(caching._TRACKED_BC) == BROADCAST_CACHE_MAX
    assert cached_broadcast(("lru", 0), lambda: [9.9]) is first  # survived
    live_keys = {k[1] for k in caching._TRACKED_BC}
    assert ("lru", 1) not in live_keys  # the true LRU was evicted
    release_operator_caches()


def test_release_cached_broadcast_by_key(spark):
    """ADVICE r11: iterative trainers release ONE iteration's broadcast
    by content key once its aggregate has collected (pq_train's
    per-iteration codebooks), instead of pinning n_iter dead copies
    until the end-of-query barrier. Release is unpersist+evict: the
    next request rebuilds."""
    from openstack_billing_from_db_spark.operators.caching import (
        _TRACKED_BC,
        cached_broadcast,
        release_cached_broadcast,
        release_operator_caches,
    )

    release_operator_caches()
    a = cached_broadcast(("iter", 0), lambda: [0.0])
    b = cached_broadcast(("iter", 1), lambda: [1.0])
    n_before = len(_TRACKED_BC)
    assert release_cached_broadcast(("iter", 0)) is True
    assert len(_TRACKED_BC) == n_before - 1
    # other keys untouched; missing key is a no-op
    assert cached_broadcast(("iter", 1), lambda: [9.9]) is b
    assert release_cached_broadcast(("iter", 0)) is False
    # released key rebuilds fresh
    assert cached_broadcast(("iter", 0), lambda: [0.5]) is not a
    release_operator_caches()


def test_pq_train_releases_iteration_broadcasts(spark):
    """pq_train over the Arrow path must end with at most ONE live
    codebook broadcast (the final iteration's assignments collected and
    released; earlier iterations released in-loop)."""
    from openstack_billing_from_db_spark.operators import quantization
    from openstack_billing_from_db_spark.operators.caching import (
        _TRACKED_BC,
        release_operator_caches,
    )

    release_operator_caches()
    emb = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), float(i % 2), float(i % 3)])
         for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    quantization.pq_train(
        emb, dims=4, n_subspaces=2, k=2, n_iter=3
    )
    # every iteration's broadcast was released right after its collect
    assert len(_TRACKED_BC) == 0
    release_operator_caches()
