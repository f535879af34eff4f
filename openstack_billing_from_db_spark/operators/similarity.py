"""Similarity search over embedding columns (``array<float>``).

Two paths:
- brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set against the corpus, rank per query. One broadcast join + one
  window; the corpus is never shuffled.
- sign-LSH (random hyperplane) bucketed top-k — the scale path: each
  vector gets an n_planes-bit bucket from data-independent ±1 hyperplanes
  (derived from md5, so the DuckDB oracle reproduces them exactly);
  candidates are same-bucket pairs only.

Scale knobs (the 100 TB hazards a fixed bucket count creates):
- ``n_planes=None`` (the default) derives the plane count from the corpus
  size so expected bucket occupancy stays bounded — bucket count GROWS
  with n instead of each bucket growing quadratically in pair count
  (``adaptive_n_planes``).
- ``n_tables`` is OR-amplification: each extra table is an independent
  set of hyperplanes; a pair is a candidate if it collides in ANY table.
  More tables → higher recall at proportional candidate cost (the
  standard LSH amplification trade; same shape as minhash banding).

All dot products fold left-to-right over array<double> (deterministic,
matches DuckDB's list_inner_product bit-for-bit — verified empirically).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from openstack_billing_from_db_spark.functions.hashing import py_hash64, seeded_hash64
from openstack_billing_from_db_spark.operators.caching import tracked_persist
from openstack_billing_from_db_spark.operators.parallelism import ensure_map_parallelism

# expected vectors per bucket the adaptive default aims for: small enough
# that the within-bucket quadratic term stays negligible, large enough
# that genuine neighbors still collide
TARGET_BUCKET_OCCUPANCY = 128


def adaptive_n_planes(
    corpus_size: int,
    target_bucket_occupancy: int = TARGET_BUCKET_OCCUPANCY,
    lo: int = 2,
    hi: int = 28,
) -> int:
    """Plane count giving ~target expected occupancy under uniform
    hashing: 2^n_planes ≈ corpus_size / target. 500 vectors → 2 planes;
    10^9 vectors → 23 planes (8M buckets) — bucket count scales with the
    corpus instead of being a constant 256."""
    if corpus_size <= target_bucket_occupancy:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(corpus_size / target_bucket_occupancy))))


def _resolve_n_planes(
    emb: DataFrame, n_planes: int | None, corpus_size: int | None
) -> int:
    if n_planes is not None:
        return n_planes
    n = corpus_size if corpus_size is not None else emb.count()
    return adaptive_n_planes(n)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_signs(
    n_planes: int, dims: int, table: int = 0
) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 — data-independent constants
    shared verbatim with the oracle SQL. ``table`` selects an independent
    family for OR-amplification (table 0 keeps the original seeds, so
    existing oracle literals are unchanged)."""
    prefix = "hp" if table == 0 else f"hp[t{table}]"
    return [
        [1.0 if py_hash64(f"{prefix}{j}|{i}") % 2 == 0 else -1.0 for i in range(dims)]
        for j in range(n_planes)
    ]


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def brute_force_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of every corpus vector for the first n_queries
    ids. Output: (query_id, neighbor_id, rn)."""
    corpus = ensure_map_parallelism(
        emb.select(
            F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("e")
        )
    ).withColumn("e_norm", norm(F.col("e")))
    queries = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q")
    ).withColumn("q_norm", norm(F.col("q")))

    pairs = corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (dot(F.col("e"), F.col("q")) / (F.col("e_norm") * F.col("q_norm"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= k)
    )


def lsh_bucket(vec: Column, signs: list[list[float]]) -> Column:
    """n_planes-bit bucket id: bit j = sign of ⟨vec, hyperplane_j⟩."""
    bucket: Column = F.lit(0).cast("long")
    for j, plane in enumerate(signs):
        plane_lit = F.array(*[F.lit(v) for v in plane])
        bucket = bucket + F.when(
            dot(vec, plane_lit) > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def _bucketed_index(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    dims: int,
    n_tables: int,
) -> DataFrame:
    """Persisted LSH index: (vid, e, e_norm, table, bucket, bucketvec) —
    one row per vector per table; ``bucketvec`` holds the vector's bucket
    in EVERY table so multi-table joins can dedup map-side (first-matching
    -table emission, no distinct exchange). This is the reusable structure
    you'd materialize to parquet (partitioned by (table, bucket)) for a
    production corpus."""
    # the n_tables × n_planes hyperplane dots are the CPU-heavy map stage;
    # guard against a single-split scan serializing them (no-op at scale)
    base = ensure_map_parallelism(
        emb.select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("e"))
    )
    bucketvec = F.array(
        *[
            lsh_bucket(F.col("e"), hyperplane_signs(n_planes, dims, t))
            for t in range(n_tables)
        ]
    )
    tb = F.explode(
        F.array(
            *[
                F.struct(F.lit(t).alias("table"), F.col("bucketvec")[t].alias("bucket"))
                for t in range(n_tables)
            ]
        )
    )
    return tracked_persist(
        base.withColumn("e_norm", norm(F.col("e")))
        .withColumn("bucketvec", bucketvec)
        .withColumn("tb", tb)
        .select(
            "vid",
            "e",
            "e_norm",
            "bucketvec",
            F.col("tb.table").alias("table"),
            F.col("tb.bucket").alias("bucket"),
        )
    )


def _first_table_only(n_tables: int, va: str, vb: str) -> Column:
    """True iff no table EARLIER than the joined one also collides — the
    map-side replacement for a pair-distinct exchange in OR-amplified
    joins (both bucket vectors are present on the joined row)."""
    cond = F.lit(True)
    for t in range(n_tables):
        cond = cond & (
            (F.col("table") <= F.lit(t)) | (F.col(va)[t] != F.col(vb)[t])
        )
    return cond


def lsh_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 10,
    k: int = 5,
    n_planes: int | None = None,
    dims: int = 64,
    n_tables: int = 1,
    corpus_size: int | None = None,
) -> DataFrame:
    """Approximate top-k: rank by cosine only within the query's LSH
    bucket(s). Recall is probabilistic (bucket misses are the ANN trade);
    at scale (table, bucket) is the shuffle/partition key, so each query
    touches ~n_tables/2^n_planes of the corpus.

    ``n_planes=None`` derives the width from the corpus size (pass
    ``corpus_size`` to avoid the count job); ``n_tables>1`` OR-amplifies
    recall with independent hyperplane families."""
    n_planes = _resolve_n_planes(emb, n_planes, corpus_size)
    index = _bucketed_index(emb, id_col, vec_col, n_planes, dims, n_tables)
    queries = index.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"),
        F.col("e").alias("q"),
        F.col("table").alias("qtable"),
        F.col("bucket").alias("qbucket"),
        F.col("bucketvec").alias("qbucketvec"),
        F.col("e_norm").alias("q_norm"),
    )
    cand = index.join(
        F.broadcast(queries),
        (F.col("table") == F.col("qtable"))
        & (F.col("bucket") == F.col("qbucket"))
        & (F.col("vid") != F.col("query_id")),
    )
    if n_tables > 1:
        # a pair colliding in several tables is scored once: emitted only
        # from its first matching table (map-side, no distinct exchange)
        cand = cand.filter(_first_table_only(n_tables, "bucketvec", "qbucketvec"))
    scored = cand.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        (dot(F.col("e"), F.col("q")) / (F.col("e_norm") * F.col("q_norm"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= k)
    )


def embedding_near_duplicates(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_planes: int | None = None,
    dims: int = 64,
    n_tables: int = 1,
    corpus_size: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH bucketing: only same-bucket
    pairs are scored. Output: (vec_a, vec_b, cos ≥ threshold).

    Defaults are the scale-safe ones: adaptive bucket width (see
    ``adaptive_n_planes``) and optional multi-table OR-amplification.
    ``max_bucket_size`` is the same boilerplate valve as on the
    minhash/simhash emitters (operators/dedup.py): oversized buckets —
    giant duplicate families with quadratic pair counts — emit nothing,
    and with multiple tables the first-matching-table test skips capped
    tables exactly like the join does."""
    n_planes = _resolve_n_planes(emb, n_planes, corpus_size)
    index = _bucketed_index(emb, id_col, vec_col, n_planes, dims, n_tables)
    size_vec = None
    if max_bucket_size is not None:
        sizes = index.groupBy("table", "bucket").agg(
            F.count(F.lit(1)).alias("__bn")
        )
        with_bn = index.join(sizes, ["table", "bucket"])
        bnvec = with_bn.groupBy("vid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("table", "__bn"))),
                lambda s: s["__bn"],
            ).alias("__bnvec")
        )
        index = with_bn.filter(F.col("__bn") <= max_bucket_size).join(bnvec, "vid")
        size_vec = "__bnvec"

    def _side(suffix: str) -> DataFrame:
        cols = [
            F.col("table"),
            F.col("bucket"),
            F.col("vid").alias(f"vec_{suffix}"),
            F.col("e").alias(f"e{suffix}"),
            F.col("e_norm").alias(f"n{suffix}"),
            F.col("bucketvec").alias(f"bv_{suffix}"),
        ]
        if size_vec is not None:
            cols.append(F.col(size_vec).alias(f"sz_{suffix}"))
        return index.select(*cols)

    a, b = _side("a"), _side("b")
    pairs = a.join(b, ["table", "bucket"]).filter(F.col("vec_a") < F.col("vec_b"))
    if n_tables > 1:
        # scored once per pair: first-matching-table emission, map-side.
        # With a cap, an earlier table only counts if its bucket was kept.
        cond = F.lit(True)
        for t in range(n_tables):
            earlier_emits = (F.col("table") > F.lit(t)) & (
                F.col("bv_a")[t] == F.col("bv_b")[t]
            )
            if size_vec is not None:
                earlier_emits = earlier_emits & (
                    F.col("sz_a")[t] <= F.lit(max_bucket_size)
                )
            cond = cond & ~earlier_emits
        pairs = pairs.filter(cond)
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            (dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def ivf_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into coarse cells by
    nearest centroid, then search only the ``n_probe`` cells nearest each
    query. The second classic ANN family next to sign-LSH (``lsh_topk``):
    data-adaptive cells instead of data-independent hyperplanes.

    Centroids here are a deterministic hash-ranked sample of the corpus
    (TakeOrderedAndProject — per-partition top-k, no global sort), which
    keeps the whole operator reproducible and SQL-expressible (q65's
    DuckDB oracle re-derives cells and probes exactly). Production corpora
    would train them with k-means (pyspark.ml) — the plumbing (assign →
    probe → in-cell rank) is unchanged by centroid provenance.

    Scale shape: centroids broadcast (n_centroids ≪ corpus); assignment is
    one map-side scoring pass + a partial-agg argmax (one narrow shuffle
    keyed on vid); candidate scoring joins the cell-keyed index against
    the broadcast probe set — the per-query work is n_probe cells, not the
    corpus. ``n_probe == n_centroids`` degrades to exact brute force
    (pinned by tests).
    """
    corpus = ensure_map_parallelism(
        emb.select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("e"))
    ).withColumn("e_norm", norm(F.col("e")))

    cents = F.broadcast(
        corpus.orderBy(
            seeded_hash64(F.col("vid").cast("string"), "ivf"), F.col("vid")
        )
        .limit(n_centroids)
        .select(
            F.col("vid").alias("cid"),
            F.col("e").alias("c"),
            F.col("e_norm").alias("c_norm"),
        )
    )

    # nearest-centroid assignment: broadcast cross-score then argmax via
    # min(struct(-cos, cid)) — partial-aggregates map-side, so the one
    # shuffle carries n_centroids-fold reduced rows
    cos_c = dot(F.col("e"), F.col("c")) / (F.col("e_norm") * F.col("c_norm"))
    index = tracked_persist(
        corpus.join(cents)
        .select("vid", "e", "e_norm", F.col("cid"), (-cos_c).alias("negcos"))
        .groupBy("vid")
        .agg(
            F.min(F.struct("negcos", "cid")).alias("m"),
            F.first("e").alias("e"),
            F.first("e_norm").alias("e_norm"),
        )
        .select("vid", "e", "e_norm", F.col("m.cid").alias("cid"))
    )

    queries = corpus.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"),
        F.col("e").alias("q"),
        F.col("e_norm").alias("q_norm"),
    )
    cos_qc = dot(F.col("q"), F.col("c")) / (F.col("q_norm") * F.col("c_norm"))
    wp = Window.partitionBy("query_id").orderBy(F.col("qc_cos").desc(), F.col("cid"))
    probed = (
        queries.join(cents)
        .select("query_id", "q", "q_norm", "cid", cos_qc.alias("qc_cos"))
        .withColumn("prn", F.row_number().over(wp))
        .filter(F.col("prn") <= n_probe)
        .select("query_id", "q", "q_norm", "cid")
    )

    cand = index.join(F.broadcast(probed), "cid").filter(
        F.col("vid") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        (dot(F.col("e"), F.col("q")) / (F.col("e_norm") * F.col("q_norm"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.select(
        "query_id", "neighbor_id", F.row_number().over(w).cast("long").alias("rn")
    ).filter(F.col("rn") <= k)


def random_projection(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dims: int = 8,
    dims: int = 64,
    table: int = 0,
) -> DataFrame:
    """Johnson-Lindenstrauss-style dimensionality reduction: project each
    vector onto ``out_dims`` deterministic ±1 hyperplanes (Achlioptas
    2003 — ±1 entries preserve pairwise distances in expectation as well
    as Gaussians, and are exactly reproducible across engines via the
    md5-derived sign family shared with the sign-LSH bucketer).

    This is the continuous complement of :func:`lsh_topk`'s bucket bits:
    instead of keeping only ``sign(⟨v, h_j⟩)``, keep the projections
    themselves — a ``dims → out_dims`` reduction that downstream ANN /
    clustering runs on at ``out_dims/dims`` of the compute and shuffle
    width.

    Plan shape: pure map-side — one projection per row, ``out_dims``
    left-to-right array folds, no shuffle, no UDF; Catalyst prunes the
    scan to (id, vec). Sums fold in array order so the doubles are
    bit-identical to DuckDB's ``list_inner_product`` (same guarantee the
    cosine path relies on).

    Output: (id_col, y0 .. y{out_dims-1}) as doubles.
    """
    signs = hyperplane_signs(out_dims, dims, table=table)
    v = _as_double(F.col(vec_col))
    cols = [
        dot(v, F.array(*[F.lit(s) for s in signs[j]])).alias(f"y{j}")
        for j in range(out_dims)
    ]
    return emb.select(F.col(id_col), *cols)


# Pin the pair stage's width only when the within-cluster pair
# quadratic is big enough that serializing it costs more than one extra
# exchange: ~1M pairs × a d-wide dot each is roughly a second of
# single-core fold work — below that the pin is pure fixed-cost loss
# (measured: the unconditional pin cost q130 +22% / q147 +14% at sf0.1,
# where the whole pair stage is ~2500 pairs).
_PAIR_PIN_MIN_PAIRS = 1_000_000


def _pin_pair_width(a: DataFrame, n_pairs_est: float | None) -> DataFrame:
    """Pin the cluster-keyed pair self-join's shuffle width (VERDICT r12
    Next #3, guide §2). The pair stage's COMPUTE is Σ_c n_c² (every
    within-cluster pair is scored) while its shuffle BYTES are only ∝ n,
    so AQE's size-based coalescing — seeing a few hundred KB — can merge
    the post-shuffle reads down to one partition and serialize the
    quadratic work. An explicit-width repartition of one side is a
    REPARTITION_BY_NUM-origin exchange, which AQE never coalesces (and
    the other side's ENSURE_REQUIREMENTS exchange must match its
    width), so the pair stage keeps cluster-parallelism at any data
    size. ``defaultParallelism`` scales with the cluster.

    ``n_pairs_est`` is the expected pair count (≈ n·target/2 on the
    ``target_cluster_size`` path — the scale configuration, where n is
    already counted for deriving k; None on the fixed-k path, which
    would need an extra count just to estimate). Below
    ``_PAIR_PIN_MIN_PAIRS`` — or unknown — the exchange costs more than
    the serialized compute it would spread, so the input passes through
    untouched."""
    if n_pairs_est is None or n_pairs_est < _PAIR_PIN_MIN_PAIRS:
        return a
    sc = a.sparkSession.sparkContext
    return a.repartition(sc.defaultParallelism, "cluster")


def semantic_dedup(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
    round_dp: int = 6,
    threshold: float = 0.5,
    target_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): the
    embedding-space dedup member whose PAIR SPACE is bounded by
    clustering instead of hashing — k-means partitions the corpus
    (operators/clustering.kmeans_fit, the same deterministic Lloyd
    machinery as q73/q110), and cosine similarity is only ever computed
    WITHIN a cluster. A vector is dropped when some lower-id vector in
    its cluster has cosine >= ``threshold`` (greedy keep-lowest-id —
    the repo's canonical-survivor rule, q87); no transitive closure, so
    the verdict per vector is a one-pass join decision.

    Scale shape: assignment is map-side over driver-literal centroids;
    the pair stage is a cluster-keyed self-join (Σ_c n_c² pairs instead
    of n² — the entire point of clustering first), narrow rows of
    (vid, e, |e|²). The cosine test is evaluated in SQUARED form
    (dot >= 0 AND dot² >= t²·|a|²·|b|²) — no sqrt, every operand a
    left-to-right array fold, cross-engine exact.

    ``target_cluster_size`` is the scale lever (the paper's k ∝ n): when
    given, k is derived as ceil(n / target) so cluster sizes — and with
    them the per-cluster pair quadratic — stay BOUNDED as the corpus
    grows (total pairs ≈ n·target/2, linear in n). Past ~1024 centroids
    the assignment automatically switches from plan literals to the
    broadcast+Arrow nearest-centroid kernel (clustering._assign).

    Output: (vec_id, cluster_id, fate) with fate kept|dropped.
    """
    from openstack_billing_from_db_spark.operators.clustering import (
        _assign,
        kmeans_fit,
    )

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1]; got {threshold}")
    base = tracked_persist(
        ensure_map_parallelism(
            emb.select(
                F.col(id_col).alias("vid"),
                _as_double(F.col(vec_col)).alias("e"),
            )
        )
    )
    n_pairs_est: float | None = None
    if target_cluster_size is not None:
        if target_cluster_size < 1:
            raise ValueError(
                f"target_cluster_size must be >= 1; got {target_cluster_size}"
            )
        n = base.count()  # base is persisted; one bounded action
        k = max(1, -(-n // target_cluster_size))
        n_pairs_est = n * target_cluster_size / 2
    cents = kmeans_fit(base, k=k, n_iter=n_iter, round_dp=round_dp)
    x = tracked_persist(
        _assign(base, cents).withColumn("n2", dot(F.col("e"), F.col("e")))
    )
    t2 = threshold * threshold
    a = x.select(
        F.col("cluster"),
        F.col("vid").alias("va"),
        F.col("e").alias("ea"),
        F.col("n2").alias("n2a"),
    )
    b = x.select(
        F.col("cluster"),
        F.col("vid").alias("vb"),
        F.col("e").alias("eb"),
        F.col("n2").alias("n2b"),
    )
    pr = (
        _pin_pair_width(a, n_pairs_est)
        .join(b, "cluster")
        .filter(F.col("va") < F.col("vb"))
        .withColumn("dot", dot(F.col("ea"), F.col("eb")))
    )
    drops = (
        pr.filter(
            (F.col("dot") >= 0)
            & (
                F.col("dot") * F.col("dot")
                >= F.lit(t2) * F.col("n2a") * F.col("n2b")
            )
        )
        .select(F.col("vb").alias("vid"))
        .distinct()
    )
    return (
        x.select("vid", "cluster")
        .join(drops.withColumn("hit", F.lit(1)), "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            F.col("cluster").cast("long").alias("cluster_id"),
            F.when(F.col("hit").isNull(), F.lit("kept"))
            .otherwise(F.lit("dropped"))
            .alias("fate"),
        )
    )


def semantic_dedup_pq(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    k: int = 8,
    n_iter: int = 2,
    round_dp: int = 6,
    threshold: float = 0.5,
    target_cluster_size: int | None = None,
    pq_subspaces: int = 8,
    pq_k: int = 16,
    pq_iter: int = 1,
    pq_dp: int = 6,
    candidate_slack: float = 0.1,
) -> DataFrame:
    """PQ-backed SemDeDup for the MEMORY-bound regime (VERDICT r9 Next
    #7: >10⁸ vectors at d ≥ 256): same clustering and canonical-
    survivor semantics as :func:`semantic_dedup`, but the cluster-keyed
    pair stage carries ``pq_subspaces`` small int codes per vector
    instead of the raw d-float array — at d=256/M=16 that is 16 bytes
    through the self-join instead of 2 KB, which is what makes the
    Σ n_c² pair shuffle feasible when the corpus no longer fits as
    floats.

    Mechanics: train per-subspace codebooks (quantization.pq_train, the
    q110 kernel), encode once map-side, and approximate each pair's
    cosine from broadcast code-to-code tables — dot(q(a), q(b)) =
    Σ_m T_m[ca_m][cb_m] and |q(a)|² = Σ_m N_m[ca_m] (subspaces are
    disjoint, so the reconstruction identities are exact). Pairs whose
    APPROXIMATE cosine clears ``threshold − candidate_slack`` re-join
    the raw vectors and pass the SAME exact squared-form verify as the
    exact path, so pq-backed drops are a SUBSET of exact drops (no
    false drops, ever — pinned by test); recall of true near-dup pairs
    depends on quantization error vs ``candidate_slack``. The tables
    are M·K² doubles (512 KB at M=16/K=256) — one broadcast, probed by
    one Arrow-batched UDF over the candidate stream.

    Output: (vec_id, cluster_id, fate) — same schema as
    :func:`semantic_dedup`."""
    from openstack_billing_from_db_spark.operators.clustering import (
        _assign,
        kmeans_fit,
    )
    from openstack_billing_from_db_spark.operators.quantization import (
        pq_encode,
        pq_train,
    )

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1]; got {threshold}")
    if candidate_slack < 0:
        raise ValueError(f"candidate_slack must be >= 0; got {candidate_slack}")
    if candidate_slack >= threshold:
        # validate BEFORE kmeans/PQ training burn the full passes
        raise ValueError(
            f"candidate_slack ({candidate_slack}) must be < threshold "
            f"({threshold}) — the candidate gate must stay positive"
        )
    base = tracked_persist(
        ensure_map_parallelism(
            emb.select(
                F.col(id_col).alias("vid"),
                _as_double(F.col(vec_col)).alias("e"),
            )
        )
    )
    n_pairs_est: float | None = None
    if target_cluster_size is not None:
        if target_cluster_size < 1:
            raise ValueError(
                f"target_cluster_size must be >= 1; got {target_cluster_size}"
            )
        n = base.count()
        k = max(1, -(-n // target_cluster_size))
        n_pairs_est = n * target_cluster_size / 2
    cents = kmeans_fit(base, k=k, n_iter=n_iter, round_dp=round_dp)
    codebooks = pq_train(
        base,
        id_col="vid",
        vec_col="e",
        dims=dims,
        n_subspaces=pq_subspaces,
        k=pq_k,
        n_iter=pq_iter,
        round_dp=pq_dp,
    )
    x = tracked_persist(
        _assign(base, cents).withColumn("n2", dot(F.col("e"), F.col("e")))
    )
    codes = pq_encode(x, codebooks, id_col="vid", vec_col="e").select(
        "vid",
        F.array(*[F.col(f"c{m}") for m in range(pq_subspaces)]).alias(
            "codes"
        ),
    )
    # narrow pair rows: (cluster, vid, M codes) — the raw e never
    # enters the self-join. Persisted: BOTH aliases of the candidate
    # self-join read this frame and Spark does not reuse the encode
    # subtree across join aliases (the q123 pref lesson) — without the
    # persist the whole Arrow pq_encode chain ran twice (q152 warm
    # profile: two stages of 17.2 s and 8.0 s task-run emitting the
    # same 10 000 code rows).
    slim = tracked_persist(x.select("cluster", "vid").join(codes, "vid"))
    a = slim.select(
        "cluster", F.col("vid").alias("va"), F.col("codes").alias("ca")
    )
    b = slim.select(
        "cluster", F.col("vid").alias("vb"), F.col("codes").alias("cb")
    )
    # squared-form candidate gate (dot_hat >= 0 AND dot_hat² >=
    # (t−slack)²·|q(a)|²·|q(b)|²) — no sqrt/division, every operand the
    # same left-to-right fold a SQL oracle replays bit-for-bit (the
    # q130/q114 parity law); equivalent to cos_hat >= t − slack except
    # that zero-norm reconstructions pass to the exact verify (which
    # then decides)
    ts2 = (threshold - candidate_slack) * (threshold - candidate_slack)
    scores = _pq_pair_scores_arrow(codebooks)
    cand = (
        _pin_pair_width(a, n_pairs_est)
        .join(b, "cluster")
        .filter(F.col("va") < F.col("vb"))
        .withColumn("ps", scores)
        .filter(
            (F.col("ps.dot_hat") >= 0)
            & (
                F.col("ps.dot_hat") * F.col("ps.dot_hat")
                >= F.lit(ts2) * F.col("ps.n2a_hat") * F.col("ps.n2b_hat")
            )
        )
        .select("va", "vb")
    )
    # exact verify on candidates only: identical predicate to
    # semantic_dedup's, so a surviving drop is exactly an exact-path drop
    ea = x.select(
        F.col("vid").alias("va"), F.col("e").alias("ea"), F.col("n2").alias("n2a")
    )
    eb = x.select(
        F.col("vid").alias("vb"), F.col("e").alias("eb"), F.col("n2").alias("n2b")
    )
    t2 = threshold * threshold
    verified = (
        cand.join(ea, "va")
        .join(eb, "vb")
        .withColumn("dot", dot(F.col("ea"), F.col("eb")))
        .filter(
            (F.col("dot") >= 0)
            & (
                F.col("dot") * F.col("dot")
                >= F.lit(t2) * F.col("n2a") * F.col("n2b")
            )
        )
    )
    drops = verified.select(F.col("vb").alias("vid")).distinct()
    return (
        x.select("vid", "cluster")
        .join(drops.withColumn("hit", F.lit(1)), "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            F.col("cluster").cast("long").alias("cluster_id"),
            F.when(F.col("hit").isNull(), F.lit("kept"))
            .otherwise(F.lit("dropped"))
            .alias("fate"),
        )
    )


def _pq_pair_scores_arrow(codebooks: list[list[list[float]]]) -> Column:
    """Approximate pair scores from two code arrays via broadcast
    code-to-code dot tables: dot_hat = Σ_m T_m[ca_m][cb_m] and
    n2_hat = Σ_m N_m[c_m] (subspaces disjoint, identities exact). Every
    float is accumulated with the SAME left-to-right per-dimension /
    per-subspace fold a SQL oracle's list_inner_product chain computes
    — no BLAS matmul, no numpy pairwise summation — so the candidate
    gate is bit-replayable cross-engine (the q130/q114 parity law).
    One Arrow batch gather per pair row — no floats ride the join.
    Returns struct(dot_hat, n2a_hat, n2b_hat)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from openstack_billing_from_db_spark.operators.caching import (
        cached_broadcast,
    )

    key = ("pq_pair_scores", tuple(
        tuple(tuple(map(float, c)) for c in cb) for cb in codebooks
    ))

    def _build():
        kmax = max(len(cb) for cb in codebooks)
        m = len(codebooks)
        dots = np.zeros((m, kmax, kmax))
        norms = np.zeros((m, kmax))
        for i, cb in enumerate(codebooks):
            cmat = np.asarray(cb, dtype=np.float64)
            kk = len(cb)
            # left-to-right per-dimension folds (element-wise adds keep
            # each entry's IEEE op sequence identical to a scalar loop)
            dacc = np.zeros((kk, kk))
            nacc = np.zeros(kk)
            for d in range(cmat.shape[1]):
                dacc += cmat[:, d][:, None] * cmat[:, d][None, :]
                nacc += cmat[:, d] * cmat[:, d]
            dots[i, :kk, :kk] = dacc
            norms[i, :kk] = nacc
        return {"dots": dots, "norms": norms}

    bc = cached_broadcast(key, _build)

    def _scores(ca, cb):
        st = bc.value
        m = st["dots"].shape[0]
        if len(ca) == 0:
            return pd.DataFrame(
                {"dot_hat": [], "n2a_hat": [], "n2b_hat": []},
                dtype="float64",
            )
        am = np.stack(ca.to_numpy()).astype(np.int64)
        bm = np.stack(cb.to_numpy()).astype(np.int64)
        n = am.shape[0]
        dot_hat = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        # subspace accumulation in m order (left-to-right, matching the
        # oracle's lip(r0a,r0b) + lip(r1a,r1b) + ... chain)
        for i in range(m):
            dot_hat = dot_hat + st["dots"][i, am[:, i], bm[:, i]]
            na = na + st["norms"][i, am[:, i]]
            nb = nb + st["norms"][i, bm[:, i]]
        return pd.DataFrame(
            {"dot_hat": dot_hat, "n2a_hat": na, "n2b_hat": nb}
        )

    scores = pandas_udf(
        _scores, "dot_hat double, n2a_hat double, n2b_hat double"
    )
    return scores(F.col("ca"), F.col("cb"))


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009) — the
    standard score-free way to combine heterogeneous retrievers (BM25
    lexical + embedding vector being THE hybrid-search pairing): each
    list contributes 1/(k0 + rank) for the items it ranked, absent
    items contribute 0, and the fused order is by total contribution.
    Score-free matters: BM25 scores and cosine similarities are not
    commensurable; ranks are.

    Engine-exact: contributions are integer MICRO-units
    (1000000 div (k0 + rank) — pure BIGINT, no doubles anywhere), so
    the fused scores and tie order (total desc, id) replay identically
    in any engine. For per-query fusion, feed rankings keyed by a
    composite id (query‖doc) — the fold is key-agnostic.

    Plan shape: every input is already a top-k list (bounded rows), so
    the outer-join cascade and final top-k are trivially small; the
    heavy lifting happened in the retrievers.

    Output: (id_col, rrf_micro, rank) for the fused top-``topk``.
    """
    from functools import reduce

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    # k0 = 0 is valid RRF (the rank assert below keeps every
    # denominator >= 1); only negative k0 could zero a denominator.
    # Restores the original k0 >= 0 contract (ADVICE r7 — the r6 fix
    # briefly narrowed this to k0 >= 1, which the rank assert makes
    # unnecessary).
    if k0 < 0:
        raise ValueError(f"k0 must be >= 0; got {k0}")
    # Ranks are 1-based by contract (Window.row_number output). A 0- or
    # negative-valued rank would make the denominator 0/negative —
    # silently nulled under non-ANSI — so it raises at execution instead
    # (assert_true yields NULL when the rank is valid → +0) (ADVICE r6).
    contribs = [
        r.select(
            F.col(id_col).alias("id"),
            F.expr(
                f"(1000000 div ({k0} + {rank_col}))"
                f" + CAST(coalesce(assert_true({rank_col} >= 1,"
                f" 'rrf_fuse: ranks must be 1-based (rank >= 1)'), 0)"
                f" AS BIGINT)"
            )
            .cast("long")
            .alias(f"c{i}"),
        )
        for i, r in enumerate(rankings)
    ]
    joined = reduce(lambda a, b: a.join(b, "id", "full_outer"), contribs)
    rrf = joined.select(
        "id",
        sum(
            (F.coalesce(F.col(f"c{i}"), F.lit(0)) for i in range(len(contribs))),
            F.lit(0).cast("long"),
        ).alias("rrf_micro"),
    )
    top = rrf.orderBy(F.desc("rrf_micro"), F.asc("id")).limit(topk)
    w = Window.orderBy(F.desc("rrf_micro"), F.asc("id"))
    return top.select(
        F.col("id").alias(id_col),
        "rrf_micro",
        F.row_number().over(w).cast("long").alias("rank"),
    )
