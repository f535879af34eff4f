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


# --- SQL-text builders for the literal-codebook expressions ------------------
#
# The literal paths embed k·d centroid doubles in the plan. Building them
# as Column objects costs ONE py4j round trip per operator/literal —
# thousands per plan, measured at 2-4 s of pure driver time per query
# build on this VM (and bench pays it for every execution). Emitting the
# identical expression as ONE SQL string parsed by F.expr collapses that
# to a single round trip; the parsed Catalyst tree is the same operators
# over the same literals, so results are bit-identical (pinned by the
# paths-agree tests and the oracle parity of every PQ/k-means query).


def _dlit(v: float) -> str:
    """Exact DOUBLE literal: repr() is the shortest round-tripping
    decimal form and Spark's parser (Java Double.parseDouble) is
    correctly rounded, so the parsed bits equal the Python float. The
    'D' suffix forces DOUBLE — a bare decimal parses as DECIMAL."""
    return repr(float(v)) + "D"


def _arr_sql(c: list[float]) -> str:
    return "array(" + ", ".join(_dlit(v) for v in c) + ")"


def _dot_sql(e_sql: str, c: list[float]) -> str:
    """⟨e, c⟩ as SQL — the same zip_with/aggregate left-to-right fold
    as clustering._dot_lit."""
    return (
        f"aggregate(zip_with({e_sql}, {_arr_sql(c)}, (x, y) -> x * y), "
        f"0.0D, (a, x) -> a + x)"
    )


def _score_sql(e_sql: str, c: list[float]) -> str:
    """|c|² − 2⟨e, c⟩ with |c|² summed left-to-right in Python floats —
    identical arithmetic to the Column path's F.lit(sum(...)) − 2·dot."""
    return f"({_dlit(sum(v * v for v in c))} - (2.0D * {_dot_sql(e_sql, c)}))"


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

    # single-parse SQL for the subspace melt and the per-(m, cluster)
    # sums (per-operator py4j Column calls cost a driver round trip
    # each, per Lloyd iteration)
    melt_sql = (
        "explode(array("
        + ", ".join(
            f"named_struct('m', CAST({m} AS INT), 'cluster', cs[{m}], "
            f"'se', {_sub_sql('e', m, sub_dims)})"
            for m in range(n_subspaces)
        )
        + "))"
    )
    agg_sql = (
        "named_struct('n', count(1), "
        + ", ".join(f"'s{i}', sum(se[{i}])" for i in range(sub_dims))
        + ")"
    )
    for _ in range(n_iter):
        assigned = base.withColumn(
            "cs", _multi_nearest_code_arrow(F.col("e"), cbs, sub_dims)
        )
        rows = assigned.select(F.expr(melt_sql).alias("s")).select(
            "s.m", "s.cluster", "s.se"
        )
        stats = (
            rows.groupBy("m", "cluster")
            .agg(F.expr(agg_sql).alias("st"))
            .collect()
        )
        # the aggregate above materialized every plan holding this
        # iteration's codebook broadcast; next iteration keys a NEW
        # content-derived broadcast, so release this one now instead of
        # pinning n_iter codebook copies in the JVM until the
        # end-of-query release barrier (ADVICE r11)
        release_cached_broadcast(_multi_codebook_key(cbs))
        by_key = {(int(r.m), int(r.cluster)): r.st for r in stats}
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


def _nearest_code(sub_sql: str, codebook: list[list[float]]) -> Column:
    """Nearest centroid of one subspace by squared L2 (ties → lowest
    code), via array_min over (score, code) structs — the same
    expression shape as clustering._assign, map-side only. Built as one
    SQL string (see the _dlit block above) so the k·d literal tree costs
    one parser call instead of thousands of py4j round trips."""
    structs = ", ".join(
        f"named_struct('score', {_score_sql(sub_sql, c)}, 'code', {j}L)"
        for j, c in enumerate(codebook)
    )
    return F.expr(f"array_min(array({structs})).code")


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
    literal = _codebook_codes(codebooks) <= LITERAL_CODEBOOK_MAX_CODES
    base = _base(emb, id_col, vec_col)
    if literal:
        cols = [
            _nearest_code(_sub_sql("e", m, sub_dims), cb).alias(f"c{m}")
            for m, cb in enumerate(codebooks)
        ]
    else:
        cols = [
            _nearest_code_arrow(_sub(F.col("e"), m, sub_dims), cb).alias(
                f"c{m}"
            )
            for m, cb in enumerate(codebooks)
        ]
    return base.select(F.col("vid").alias(id_col), *cols)


def _sub_sql(e_sql: str, m: int, sub_dims: int) -> str:
    """SQL form of :func:`_sub` (1-based contiguous subspace slice)."""
    return f"slice({e_sql}, {m * sub_dims + 1}, {sub_dims})"


def _sqdiff_fold_sql(a_sql: str, b_sql: str) -> str:
    """Σ (a_i − b_i)² as the zip_with/aggregate left-to-right fold."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> (x - y) * (x - y)), "
        f"0.0D, (a, x) -> a + x)"
    )


def _sub_dist_lit(m: int, cb: list[list[float]]) -> str:
    """ADC per-subspace distance |q_sub − c|² for the row's code
    column ``c{m}`` against query slice ``q{m}``, as a chained literal
    lookup over the K codebook entries (small K only) — SQL text, same
    nested-conditional tree the Column builder produced."""
    expr = "0.0D"
    for j, c in enumerate(cb):
        d = _sqdiff_fold_sql(f"q{m}", _arr_sql(c))
        expr = f"(CASE WHEN (c{m} = {j}) THEN {d} ELSE {expr} END)"
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
    if _codebook_codes(codebooks) <= LITERAL_CODEBOOK_MAX_CODES:
        acc = "0.0D"
        for m, cb in enumerate(codebooks):
            acc = f"({acc} + {_sub_dist_lit(m, cb)})"
        return F.expr(acc)
    return sum(
        (_sub_dist_arrow(m, cb) for m, cb in enumerate(codebooks)),
        F.lit(0.0),
    )


def _cell_scores(e_sql: str, coarse_centroids: list[list[float]]) -> Column:
    """(score, cell) structs per coarse centroid — array_min/array_sort
    over this gives nearest cell / probe order. Coarse centroid counts
    are small by construction (n_cells ≪ corpus), so always literal
    (one SQL parse; see the _dlit block)."""
    structs = ", ".join(
        f"named_struct('score', {_score_sql(e_sql, c)}, 'cell', {j}L)"
        for j, c in enumerate(coarse_centroids)
    )
    return F.expr(f"array({structs})")


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

    cell_scores = _cell_scores("e", coarse_centroids)

    # assign cells on the same persisted base, then attach to the codes
    cells = base.select(
        "vid", F.array_min(cell_scores)["cell"].alias("cell")
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
            F.array_sort(cell_scores), 1, n_probe
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
    scores = _cell_scores("e", coarse_centroids)
    withcell = base.withColumn("cell", F.array_min(scores)["cell"])
    return withcell.select(
        "vid", "cell", _residual_sql("e", "cell", coarse_centroids).alias("e")
    )


def _residual_sql(
    e_sql: str, cell_sql: str, coarse_centroids: list[list[float]]
) -> Column:
    """``e − centroid[cell]`` as a chained literal CASE over the cells —
    the same nested-conditional zip_with tree the Column builder
    produced, parsed in one round trip."""
    res = None
    for j in reversed(range(len(coarse_centroids))):
        sub = (
            f"zip_with({e_sql}, {_arr_sql(coarse_centroids[j])}, "
            f"(x, y) -> x - y)"
        )
        res = (
            sub
            if res is None
            else f"(CASE WHEN ({cell_sql} = {j}) THEN {sub} ELSE {res} END)"
        )
    return F.expr(res)


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

    probed = (
        base.orderBy("vid")
        .limit(n_queries)
        .select(
            F.col("vid").alias("query_id"),
            "e",
            F.slice(
                F.array_sort(_cell_scores("e", coarse_centroids)), 1, n_probe
            ).alias("probes"),
        )
        .select("query_id", "e", F.explode("probes").alias("pr"))
        .select("query_id", "e", F.col("pr.cell").alias("cell"))
    )
    # query residual w.r.t. the PROBED cell (not the query's own cell);
    # materialize it ONCE per row, then slice per subspace — the prior
    # shape inlined the whole residual CASE tree into each of the M
    # slices (M copies in the plan, M evaluations per row)
    probed = probed.select(
        "query_id",
        "cell",
        _residual_sql("e", "cell", coarse_centroids).alias("__qr"),
    ).select(
        "query_id",
        "cell",
        *[
            _sub(F.col("__qr"), m, sub_dims).alias(f"q{m}")
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
