"""Product quantization (PQ) — compressed embeddings for ANN at 100 TB.

Jégou, Douze & Schmid 2011 ("Product quantization for nearest neighbor
search"): split each D-dim vector into M contiguous subvectors, k-means
each subspace independently (M codebooks of K centroids each), and store
a vector as its M nearest-centroid codes — D doubles shrink to M small
ints (e.g. 64×8 bytes → 8×1 byte, 64×), while asymmetric distance
computation (ADC) approximates L2 against UNCOMPRESSED queries by
summing per-subspace distances to the coded centroids.

Why this matters at scale: a 10^9-vector corpus of 64-dim doubles is
512 GB of embedding payload PER SCAN; its PQ codes are 8 GB — the
difference between an ANN sweep that reshuffles half a terabyte and one
that broadcasts codebooks (M·K·(D/M) doubles — kilobytes) and scans
narrow code rows. This is the compression path the IVF operator
(operators/similarity.ivf_topk) composes with in a full IVF-PQ system.

Engine-exact: codebooks come from the same deterministic Lloyd
iterations as q73 (seed = k lowest ids per subspace, half-up-rounded
means — operators/clustering.kmeans_fit), so the DuckDB oracle replays
training bit-for-bit; assignment ties break to the lowest code id via
the identical (score, cid) ordering.

Plan shape: training runs ALL M subspace Lloyd iterations in one pass
(one multi-subspace Arrow assignment + one grouped aggregate per
iteration over a shared persisted base — M·k-row collects, never M
corpus scans); encoding is one pure map-side projection
over driver-literal codebooks (no shuffle, no UDF); ADC scoring is a
map-side fold per (query, subspace) over broadcast literals.

Reference: no vector machinery exists in the reference
(beyond-reference north-star component).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.operators.caching import (
    release_cached_broadcast,
    tracked_persist,
)
from openstack_billing_from_db_spark.operators.parallelism import (
    ensure_map_parallelism,
)


def _sub(col: Column, m: int, sub_dims: int) -> Column:
    """1-based contiguous slice for subspace m (Spark slice is 1-based,
    matching DuckDB list slicing)."""
    return F.slice(col, m * sub_dims + 1, sub_dims)


def _base(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return ensure_map_parallelism(
        emb.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).cast("array<double>").alias("e"),
        )
    )


def pq_train(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    n_subspaces: int = 8,
    k: int = 4,
    n_iter: int = 1,
    round_dp: int = 6,
) -> list[list[list[float]]]:
    """Train the M codebooks: ``codebooks[m][c]`` is centroid ``c`` of
    subspace ``m`` (each ``dims // n_subspaces`` wide).

    ALL M subspaces train in ONE pass per Lloyd iteration: a single
    multi-subspace nearest-code map stage assigns every subvector, the
    rows explode to (m, cluster, subvector), and one grouped aggregate
    returns every subspace's per-cluster sums together — 1 seed job +
    ``n_iter`` jobs total, vs M·(1 + n_iter) for M independent
    kmeans_fit runs. At 10⁹ vectors that is the difference between one
    corpus scan per iteration and M of them. Semantics are unchanged and
    bit-identical to per-subspace kmeans_fit (same k-lowest-id seeds
    sub-sliced, same left-to-right score fold via _fold_scores — the
    argmin ties → lowest code — same per-cluster double sums, same
    half-up-rounded means; empty clusters keep their previous centroid),
    which is what the per-subspace SQL oracles replay
    (test_pq_train_one_pass_matches_per_subspace pins ≡ kmeans_fit)."""
    if dims % n_subspaces:
        raise ValueError(f"dims {dims} not divisible by n_subspaces {n_subspaces}")
    sub_dims = dims // n_subspaces
    base = tracked_persist(_base(emb, id_col, vec_col))

    from openstack_billing_from_db_spark.operators.clustering import (
        lloyd_update,
    )

    # seeds: ONE job — the k lowest-id full vectors, sub-sliced per
    # subspace (identical to each per-subspace kmeans_fit's
    # orderBy(vid).limit(k) over the sliced base)
    seed_rows = base.orderBy("vid").limit(k).select("vid", "e").collect()
    if not seed_rows:
        raise ValueError("pq_train: input has no vectors")
    cbs: list[list[list[float]]] = [
        [list(r.e)[m * sub_dims : (m + 1) * sub_dims] for r in seed_rows]
        for m in range(n_subspaces)
    ]

    for _ in range(n_iter):
        assigned = base.withColumn(
            "cs", _multi_nearest_code_arrow(F.col("e"), cbs, sub_dims)
        )
        rows = assigned.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).cast("int").alias("m"),
                            F.col("cs")[m].alias("cluster"),
                            _sub(F.col("e"), m, sub_dims).alias("se"),
                        )
                        for m in range(n_subspaces)
                    ]
                )
            ).alias("s")
        ).select("s.m", "s.cluster", "s.se")
        stats = (
            rows.groupBy("m", "cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col("se")[i]).alias(f"s{i}") for i in range(sub_dims)],
            )
            .collect()
        )
        # the aggregate above materialized every plan holding this
        # iteration's codebook broadcast; next iteration keys a NEW
        # content-derived broadcast, so release this one now instead of
        # pinning n_iter codebook copies in the JVM until the
        # end-of-query release barrier (ADVICE r11)
        release_cached_broadcast(_multi_codebook_key(cbs))
        by_key = {(int(r.m), int(r.cluster)): r for r in stats}
        cbs = [
            lloyd_update(
                cbs[m],
                {c: r for (mm, c), r in by_key.items() if mm == m},
                dims=sub_dims,
                round_dp=round_dp,
            )
            for m in range(n_subspaces)
        ]
    return cbs


def _multi_codebook_key(codebooks: list[list[list[float]]]) -> tuple:
    """Content key of the multi-subspace codebook broadcast — shared by
    :func:`_multi_nearest_code_arrow` (create) and :func:`pq_train`
    (release after each iteration's aggregate collects)."""
    return (
        "pq_multi_nearest",
        tuple(tuple(tuple(map(float, c)) for c in cb) for cb in codebooks),
    )


def _multi_nearest_code_arrow(
    vec: Column, codebooks: list[list[list[float]]], sub_dims: int
) -> Column:
    """Nearest code of EVERY subspace in one Arrow batch: returns
    array<long> of M codes per vector. Per subspace the score fold and
    first-minimum argmin are _fold_scores — operation-identical to the
    literal path (_nearest_code), so training assignments match the
    per-subspace kernels bit-for-bit."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from openstack_billing_from_db_spark.operators.caching import (
        cached_broadcast,
    )

    key = _multi_codebook_key(codebooks)
    bc = cached_broadcast(
        key, lambda: [[list(map(float, c)) for c in cb] for cb in codebooks]
    )

    def _nearest(parr):
        if len(parr) == 0:
            return pd.Series([], dtype="object")
        emat = np.stack(parr.to_numpy())
        cbs_v = bc.value
        codes = np.empty((emat.shape[0], len(cbs_v)), dtype=np.int64)
        for m, cb in enumerate(cbs_v):
            sub = emat[:, m * sub_dims : (m + 1) * sub_dims]
            codes[:, m] = np.argmin(_fold_scores(sub, cb), axis=1)
        return pd.Series(list(codes))

    nearest = pandas_udf(_nearest, "array<long>")
    return nearest(vec)


# Above this TOTAL centroid count (Σ_m K_m) the codebooks stop riding
# the plan as literals: at FAISS-realistic M=16, K=256 that is 4096
# embedded centroid arrays and a Catalyst expression tree that won't
# codegen happily. Bigger codebooks ship as a real Spark broadcast
# probed by an Arrow-batched pandas UDF — the same auto-select the
# Bloom probe uses (operators/curation.py LITERAL_BITSET_MAX_BITS).
LITERAL_CODEBOOK_MAX_CODES = 1 << 10


def _codebook_codes(codebooks: list[list[list[float]]]) -> int:
    return sum(len(cb) for cb in codebooks)


def _fold_scores(emat, codebook):
    """Per-code scores |c|² − 2⟨e, c⟩ over a numpy batch, with the dot
    accumulated LEFT-TO-RIGHT per dimension — operation-for-operation
    the same float64 fold as the literal path (clustering._dot_lit), so
    argmin ties resolve identically on both paths.

    Vectorized over CODES, not dimensions: the fold walks dimensions in
    order (each (row, code) element sees the identical IEEE add/mul
    sequence as a scalar loop would — bit-equality pinned by the
    paths-agree tests) while every code updates in one numpy op, which
    is what makes k ≈ 10^4 centroids (the SemDeDup large-k regime and
    K=256 PQ codebooks) tractable. Rows are sub-chunked so the
    (rows × codes) accumulator stays ≈ 64 MB regardless of k."""
    import numpy as np

    cmat = np.asarray(codebook, dtype=np.float64)
    k, d = cmat.shape
    # |c|² summed left-to-right in Python floats — same as the literal
    # path's F.lit(sum(v * v for v in c))
    cn = np.array([sum(v * v for v in c) for c in codebook])
    scores = np.empty((emat.shape[0], k))
    chunk = max(1, 8_000_000 // max(k, 1))
    for s in range(0, emat.shape[0], chunk):
        e = emat[s : s + chunk]
        acc = np.zeros((e.shape[0], k))
        for i in range(d):
            acc += e[:, i : i + 1] * cmat[None, :, i]
        scores[s : s + chunk] = cn[None, :] - 2.0 * acc
    return scores


def _nearest_code_arrow(sub: Column, codebook: list[list[float]]) -> Column:
    """Large-codebook nearest-centroid: codebook on a Spark broadcast,
    argmin over an Arrow batch (numpy argmin takes the FIRST minimum —
    the same ties → lowest code rule as the struct-min literal path)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from openstack_billing_from_db_spark.operators.caching import (
        cached_broadcast,
    )

    # content-keyed: repeated encode builds over the same codebook in a
    # long-lived session reuse one broadcast (released by
    # release_operator_caches) instead of pinning a new JVM copy per call
    key = ("pq_nearest", tuple(tuple(map(float, c)) for c in codebook))
    bc = cached_broadcast(
        key, lambda: [list(map(float, c)) for c in codebook]
    )

    def _nearest(parr):
        if len(parr) == 0:
            return pd.Series([], dtype="int64")
        emat = np.stack(parr.to_numpy())
        return pd.Series(np.argmin(_fold_scores(emat, bc.value), axis=1))

    nearest = pandas_udf(_nearest, "long")
    return nearest(sub)


def _nearest_code(sub: Column, codebook: list[list[float]]) -> Column:
    """Nearest centroid of one subspace by squared L2 (ties → lowest
    code), via array_min over (score, code) structs — the same
    expression shape as clustering._assign, map-side only."""
    from openstack_billing_from_db_spark.operators.clustering import _dot_lit

    scored = F.array(
        *[
            F.struct(
                (F.lit(sum(v * v for v in c)) - 2.0 * _dot_lit(sub, c)).alias(
                    "score"
                ),
                F.lit(j).cast("long").alias("code"),
            )
            for j, c in enumerate(codebook)
        ]
    )
    return F.array_min(scored)["code"]


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as its M codes: (vec_id, c0 .. c{M-1}).
    Pure map-side projection; codebooks ride the plan as literals up to
    LITERAL_CODEBOOK_MAX_CODES total centroids, as a broadcast probed
    via Arrow beyond (both ties → lowest code)."""
    sub_dims = len(codebooks[0][0])
    nearest = (
        _nearest_code
        if _codebook_codes(codebooks) <= LITERAL_CODEBOOK_MAX_CODES
        else _nearest_code_arrow
    )
    base = _base(emb, id_col, vec_col)
    return base.select(
        F.col("vid").alias(id_col),
        *[
            nearest(_sub(F.col("e"), m, sub_dims), cb).alias(f"c{m}")
            for m, cb in enumerate(codebooks)
        ],
    )


def _sub_dist_lit(m: int, cb: list[list[float]]) -> Column:
    """ADC per-subspace distance |q_sub − c|² for the row's code
    column ``c{m}`` against query slice ``q{m}``, as a chained literal
    lookup over the K codebook entries (small K only)."""
    expr: Column = F.lit(0.0)
    for j, c in enumerate(cb):
        d = F.aggregate(
            F.zip_with(
                F.col(f"q{m}"),
                F.array(*[F.lit(v) for v in c]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        expr = F.when(F.col(f"c{m}") == j, d).otherwise(expr)
    return expr


def _sub_dist_arrow(m: int, cb: list[list[float]]) -> Column:
    """Large-codebook ADC lookup: gather the coded centroid from a
    broadcast table, fold (q−c)² left-to-right per dimension — the same
    float64 operation order as the literal path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from openstack_billing_from_db_spark.operators.caching import (
        cached_broadcast,
    )

    key = ("pq_adc", tuple(tuple(map(float, c)) for c in cb))
    bc = cached_broadcast(key, lambda: np.array(cb, dtype=np.float64))

    def _dist(codes, qarr):
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        cmat = bc.value[codes.to_numpy()]
        qmat = np.stack(qarr.to_numpy())
        acc = np.zeros(len(codes))
        for i in range(cmat.shape[1]):
            d = qmat[:, i] - cmat[:, i]
            acc = acc + d * d
        return pd.Series(acc)

    dist = pandas_udf(_dist, "double")
    return dist(F.col(f"c{m}"), F.col(f"q{m}"))


def _adist(codebooks: list[list[list[float]]]) -> Column:
    """Total asymmetric distance Σ_m sub_dist(m) over columns
    (c0..c{M-1}, q0..q{M-1}), auto-selecting the lookup implementation
    by total codebook size (same policy as pq_encode)."""
    sub_dist = (
        _sub_dist_lit
        if _codebook_codes(codebooks) <= LITERAL_CODEBOOK_MAX_CODES
        else _sub_dist_arrow
    )
    return sum((sub_dist(m, cb) for m, cb in enumerate(codebooks)), F.lit(0.0))


def _cell_scores(vec: Column, coarse_centroids: list[list[float]]) -> Column:
    """(score, cell) structs per coarse centroid — array_min/array_sort
    over this gives nearest cell / probe order. Coarse centroid counts
    are small by construction (n_cells ≪ corpus), so always literal."""
    from openstack_billing_from_db_spark.operators.clustering import _dot_lit

    return F.array(
        *[
            F.struct(
                (F.lit(sum(v * v for v in c)) - 2.0 * _dot_lit(vec, c)).alias(
                    "score"
                ),
                F.lit(j).cast("long").alias("cell"),
            )
            for j, c in enumerate(coarse_centroids)
        ]
    )


def pq_adc_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 10,
    topk: int = 5,
) -> DataFrame:
    """Asymmetric-distance top-k: UNCOMPRESSED query vectors scored
    against the corpus's PQ codes. The approximate squared L2 is

        d(q, x) ≈ Σ_m |q_sub(m) − codebook[m][code_m(x)]|²

    computed as a map-side per-subspace lookup fold over the broadcast
    codebooks — the corpus side touches only its narrow code columns
    (never the raw embeddings: that is the point). Queries are the first
    ``n_queries`` corpus vectors by id (same convention as the exact and
    LSH top-k operators, so recall is directly comparable).

    Output: (query_id, neighbor_id, rn) with rn 1..topk per query by
    (approx distance, neighbor_id).
    """
    from pyspark.sql import Window

    sub_dims = len(codebooks[0][0])
    codes = pq_encode(emb, codebooks, id_col=id_col, vec_col=vec_col)
    base = _base(emb, id_col, vec_col)
    queries = base.orderBy("vid").limit(n_queries).select(
        F.col("vid").alias("query_id"),
        *[
            _sub(F.col("e"), m, sub_dims).alias(f"q{m}")
            for m in range(len(codebooks))
        ],
    )
    pairs = codes.withColumnRenamed(id_col, "neighbor_id").crossJoin(
        F.broadcast(queries)
    ).filter(F.col("neighbor_id") != F.col("query_id"))

    scored = pairs.withColumn("adist", _adist(codebooks))
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w).cast("long").alias("rn"),
    ).filter(F.col("rn") <= topk)


def ivf_pq_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    coarse_centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
    n_queries: int = 10,
    topk: int = 5,
) -> DataFrame:
    """IVF-PQ: the full billion-scale ANN composition — a coarse
    quantizer (Lloyd cells, as operators/similarity.ivf_topk) partitions
    the corpus into inverted lists, and within the ``n_probe`` cells
    nearest to each query only the PQ CODES are scanned with asymmetric
    distance. Cell assignment and probing are map-side over
    driver-literal centroids; the candidate join is cell-keyed (narrow
    code rows); nothing touches raw corpus embeddings after encode.

    This variant quantizes raw vectors (IVF + PQ side by side); the
    classic refinement quantizes residuals (vector − cell centroid),
    which reuses this exact plumbing with a residual projection before
    encode — omitted here to keep the oracle replay single-stage.

    Output: (query_id, neighbor_id, rn) with rn 1..topk per query by
    (approx distance, neighbor_id) over the probed candidates.
    """
    from pyspark.sql import Window

    sub_dims = len(codebooks[0][0])
    base = tracked_persist(_base(emb, id_col, vec_col))

    def cell_scores(vec: Column) -> Column:
        return _cell_scores(vec, coarse_centroids)

    # assign cells on the same persisted base, then attach to the codes
    cells = base.select(
        "vid", F.array_min(cell_scores(F.col("e")))["cell"].alias("cell")
    )
    codes = pq_encode(base, codebooks, id_col="vid", vec_col="e").join(
        cells, "vid"
    )

    queries = base.orderBy("vid").limit(n_queries).select(
        F.col("vid").alias("query_id"),
        *[
            _sub(F.col("e"), m, sub_dims).alias(f"q{m}")
            for m in range(len(codebooks))
        ],
        F.slice(
            F.array_sort(cell_scores(F.col("e"))), 1, n_probe
        ).alias("probes"),
    )
    probed = queries.select(
        "query_id",
        *[F.col(f"q{m}") for m in range(len(codebooks))],
        F.explode("probes").alias("pr"),
    ).select(
        "query_id",
        *[F.col(f"q{m}") for m in range(len(codebooks))],
        F.col("pr.cell").alias("cell"),
    )
    pairs = codes.withColumnRenamed("vid", "neighbor_id").join(
        F.broadcast(probed), "cell"
    ).filter(F.col("neighbor_id") != F.col("query_id"))

    scored = pairs.withColumn("adist", _adist(codebooks))
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w).cast("long").alias("rn"),
    ).filter(F.col("rn") <= topk)


def ivf_pq_rerank_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    coarse_centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
    n_queries: int = 10,
    topk: int = 5,
    rerank: int = 4,
) -> DataFrame:
    """IVF-PQ with an exact re-rank stage — the standard last mile of
    the production ANN pipeline (the refinement FAISS calls RFlat): the
    compressed scan of :func:`ivf_pq_topk` produces top-``topk·rerank``
    ADC candidates per query, and ONLY that bounded set (n_queries ·
    topk · rerank rows) is re-scored against the uncompressed vectors,
    emitting the exact-distance top-``topk``. Recovers most of the
    recall PQ compression loses while touching raw embeddings for a
    candidate set whose size is independent of corpus size — the
    re-fetch is a broadcast-hash join of the tiny candidate list into
    the embedding table, never a corpus shuffle.

    Output: (query_id, neighbor_id, rn) with rn 1..topk per query by
    (exact squared L2, neighbor_id) — same fold arithmetic and tie
    order as the q114 exact side, so recall eval composes directly.
    """
    from pyspark.sql import Window

    if rerank < 1:
        raise ValueError(f"rerank must be >= 1; got {rerank}")
    cand = ivf_pq_topk(
        emb,
        codebooks,
        coarse_centroids,
        id_col=id_col,
        vec_col=vec_col,
        n_probe=n_probe,
        n_queries=n_queries,
        topk=topk * rerank,
    ).select("query_id", "neighbor_id")
    base = tracked_persist(_base(emb, id_col, vec_col))
    queries = (
        base.orderBy("vid")
        .limit(n_queries)
        .select(F.col("vid").alias("query_id"), F.col("e").alias("qe"))
    )
    nvec = base.select(
        F.col("vid").alias("neighbor_id"), F.col("e").alias("ne")
    )
    # candidate list is the broadcast side: the corpus-sized vector
    # table is probed by hash, not shuffled
    pairs = nvec.join(F.broadcast(cand), "neighbor_id").join(
        F.broadcast(queries), "query_id"
    )
    dist = F.aggregate(
        F.zip_with(F.col("qe"), F.col("ne"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    return (
        pairs.withColumn("dist", dist)
        .select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= topk)
    )


def residualize(
    base: DataFrame, coarse_centroids: list[list[float]]
) -> DataFrame:
    """(vid, e) → (vid, cell, e) with e replaced by the RESIDUAL
    ``e − centroid[cell]`` — the transform that turns side-by-side
    IVF+PQ into true residual IVF-PQ (Jégou et al. §IV): residuals
    cluster around the origin regardless of which cell a vector lives
    in, so one shared set of PQ codebooks quantizes every cell's
    displacement field far more accurately than raw coordinates.
    Map-side: per-row centroid selection is a chained literal lookup,
    the subtraction a zip_with."""
    scores = _cell_scores(F.col("e"), coarse_centroids)
    withcell = base.withColumn("cell", F.array_min(scores)["cell"])
    res = None
    for j in reversed(range(len(coarse_centroids))):
        c = coarse_centroids[j]
        sub = F.zip_with(
            F.col("e"),
            F.array(*[F.lit(v) for v in c]),
            lambda x, y: x - y,
        )
        res = sub if res is None else F.when(F.col("cell") == j, sub).otherwise(res)
    return withcell.select("vid", "cell", res.alias("e"))


def ivf_pq_residual_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    coarse_centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
    n_queries: int = 10,
    topk: int = 5,
) -> DataFrame:
    """Residual IVF-PQ — the FAISS-style refinement of
    :func:`ivf_pq_topk`: the PQ codebooks are trained on (and encode)
    each vector's RESIDUAL from its cell centroid (``codebooks`` must
    come from ``pq_train`` over :func:`residualize` output), and a query
    probing cell c is scored via its own residual from c — distances
    measure displacement-to-displacement within the cell. Same plan
    shape as the raw variant: everything map-side over driver literals
    except the cell-keyed candidate join over narrow code rows.

    Output: (query_id, neighbor_id, rn), rn 1..topk per query by
    (approx distance, neighbor_id) over probed candidates.
    """
    from pyspark.sql import Window

    sub_dims = len(codebooks[0][0])
    base = tracked_persist(_base(emb, id_col, vec_col))
    rbase = residualize(base, coarse_centroids)
    codes = pq_encode(
        rbase.select("vid", "e"), codebooks, id_col="vid", vec_col="e"
    ).join(rbase.select("vid", "cell"), "vid")

    def cell_scores(vec: Column) -> Column:
        return _cell_scores(vec, coarse_centroids)

    probed = (
        base.orderBy("vid")
        .limit(n_queries)
        .select(
            F.col("vid").alias("query_id"),
            "e",
            F.slice(F.array_sort(cell_scores(F.col("e"))), 1, n_probe).alias(
                "probes"
            ),
        )
        .select("query_id", "e", F.explode("probes").alias("pr"))
        .select("query_id", "e", F.col("pr.cell").alias("cell"))
    )
    # query residual w.r.t. the PROBED cell (not the query's own cell)
    qres = None
    for j in reversed(range(len(coarse_centroids))):
        c = coarse_centroids[j]
        sub = F.zip_with(
            F.col("e"), F.array(*[F.lit(v) for v in c]), lambda x, y: x - y
        )
        qres = sub if qres is None else F.when(F.col("cell") == j, sub).otherwise(qres)
    probed = probed.select(
        "query_id",
        "cell",
        *[
            _sub(qres, m, sub_dims).alias(f"q{m}")
            for m in range(len(codebooks))
        ],
    )
    pairs = codes.withColumnRenamed("vid", "neighbor_id").join(
        F.broadcast(probed), "cell"
    ).filter(F.col("neighbor_id") != F.col("query_id"))

    scored = pairs.withColumn("adist", _adist(codebooks))
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w).cast("long").alias("rn"),
    ).filter(F.col("rn") <= topk)
