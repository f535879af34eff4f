"""K-minimum-values (KMV) distinct-count sketch — a mergeable cardinality
sketch with engine-exact integer arithmetic.

Bar-Yossef et al. 2002 ("Counting distinct elements in a data stream"):
hash every distinct value uniformly into [0, M); the k-th smallest hash
t_k estimates the cardinality as (k-1) * M / t_k. The sketch is the
k-vector of minimum hashes — mergeable (union = merge-and-truncate), so
it composes across partitions, files, and days exactly like the minhash
signature index (operators/dedup.py).

Engine portability: Spark's ``approx_count_distinct`` is HyperLogLog++
with JVM-internal hashing — not reproducible in DuckDB. Here the hash is
the portable md5-derived family (functions/hashing.py) truncated to
52 bits, so (k-1)*M fits a signed 64-bit integer for every practical k
(k ≤ 2047) and the whole estimate is BIGINT floor arithmetic, identical
in both engines — the oracle hash-matches bit-for-bit.

Plan shape at 100 TB: the input is first reduced to the DISTINCT
(group, value) stream — a partial-aggregated hash exchange whose output
is vocabulary-sized (≪ corpus). The per-group k-minimum selection is a
window over that reduced stream; the final estimate is a one-row-per-
group aggregation. Nothing wide shuffles, nothing collects.

Reference: no sketches exist in the reference (beyond-reference
north-star component).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KMV_BITS = 52
KMV_M = 1 << KMV_BITS  # 4_503_599_627_370_496


def kmv_hash(col: Column) -> Column:
    """52-bit portable hash: first 13 hex chars of md5, identical in
    Spark and DuckDB (see :func:`kmv_hash_sql`)."""
    return F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("bigint")


def kmv_hash_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 13)) AS BIGINT)"


def kmv_partial(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    k: int = 16,
) -> DataFrame:
    """The mergeable KMV state for one slice of the data: per group, the
    k smallest (hash, value) pairs over the slice's DISTINCT values.
    Output: (group, v, h) — at most k rows per group. Slices compose via
    :func:`kmv_merge`; :func:`kmv_finalize` turns state into estimates.
    This partial/merge/finalize trio is the incremental API the batch
    wrapper (:func:`kmv_distinct`) and the streaming accumulator
    (streaming/sketch_stream.py) share."""
    if not 1 < k <= 2047:
        raise ValueError(f"k must be in (1, 2047], got {k}")
    hashed = (
        df.select(group_col, value_col)
        .distinct()
        .select(
            group_col,
            F.col(value_col).alias("v"),
            kmv_hash(F.col(value_col).cast("string")).alias("h"),
        )
    )
    w = Window.partitionBy(group_col).orderBy("h", "v")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_merge(parts: DataFrame, *, group_col: str, k: int = 16) -> DataFrame:
    """Union-of-slices → the union's KMV state: re-deduplicate values
    (a value can be a minimum of several slices) and re-truncate to the
    k smallest per group. ``merge(partial(A), partial(B)) ≡
    partial(A ∪ B)`` — pinned by test_sketch_ops."""
    w = Window.partitionBy(group_col).orderBy("h", "v")
    return (
        parts.select(group_col, "v", "h")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_finalize(minima: DataFrame, *, group_col: str, k: int = 16) -> DataFrame:
    """KMV state → per-group cardinality estimate:
    (group, k_used, kth_hash, est_distinct). Groups holding fewer than k
    minima are exact (the state IS their full distinct set)."""
    agg = minima.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("h").alias("kth_hash"),
    )
    return agg.select(
        group_col,
        "k_used",
        "kth_hash",
        F.when(F.col("k_used") < k, F.col("k_used"))
        .otherwise(F.expr(f"{(k - 1) * KMV_M}L div kth_hash"))
        .cast("long")
        .alias("est_distinct"),
    )


def kmv_distinct(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    k: int = 16,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: (group, n_distinct_exact, k_used, kth_hash, est_distinct).
    ``n_distinct_exact`` rides along from the same distinct stream the
    sketch is built on, so accuracy is directly inspectable. Groups with
    fewer than ``k`` distinct values are exact by construction
    (``est_distinct = k_used``); otherwise

        est_distinct = (k-1) * M // kth_hash

    with M = 2^52 — pure BIGINT floor division (engine-exact).
    """
    if not 1 < k <= 2047:
        raise ValueError(f"k must be in (1, 2047], got {k}")
    distinct = df.select(group_col, value_col).distinct()
    hashed = distinct.select(
        group_col,
        F.col(value_col).alias("v"),
        kmv_hash(F.col(value_col).cast("string")).alias("h"),
    )
    w = Window.partitionBy(group_col).orderBy("h", "v")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_distinct_exact"),
        F.sum(F.when(F.col("rn") <= k, 1).otherwise(0)).cast("long").alias("k_used"),
        F.max(F.when(F.col("rn") <= k, F.col("h"))).alias("kth_hash"),
    )
    return agg.select(
        group_col,
        "n_distinct_exact",
        "k_used",
        "kth_hash",
        F.when(F.col("k_used") < k, F.col("k_used"))
        .otherwise(F.expr(f"{(k - 1) * KMV_M}L div kth_hash"))
        .cast("long")
        .alias("est_distinct"),
    )


def kmv_pairwise_overlap(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    k: int = 16,
) -> DataFrame:
    """Estimated distinct-value overlap between every pair of groups,
    computed entirely on the groups' KMV sketches (Beyer et al. 2007,
    "On synopses for distinct-value estimation under multiset
    operations"): for a pair (a, b), rank the union of the two k-min
    sets, keep the union's k minima, and count how many of those live in
    BOTH sketches — that fraction ρ estimates Jaccard(a, b), and
    ρ · est(|a ∪ b|) estimates the intersection size. Pairs whose union
    holds fewer than k values are EXACT (the state is the full union).

    The corpus is scanned exactly once (the per-group sketch build);
    the pairwise stage touches only k·groups sketch rows — this is how
    you screen all source pairs for vocabulary overlap at 100 TB without
    a corpus-sized self-join. Integer arithmetic throughout:

        est_union        = (k-1)·M // kth_union          (or exact)
        est_intersection = matches · est_union // k_used
        jaccard_micro    = matches · 10^6 // k_used

    Output: (grp_a, grp_b, k_used, matches, est_union, est_intersection,
    jaccard_micro) for every unordered pair grp_a < grp_b.
    """
    sk = kmv_partial(df, group_col=group_col, value_col=value_col, k=k)
    srcs = sk.select(group_col).distinct()
    pairs = (
        srcs.select(F.col(group_col).alias("grp_a"))
        .join(
            srcs.select(F.col(group_col).alias("grp_b")),
            F.col("grp_a") < F.col("grp_b"),
        )
        .select(
            "grp_a",
            "grp_b",
            F.explode(F.array("grp_a", "grp_b")).alias(group_col),
        )
    )
    rows = (
        pairs.join(sk, group_col)
        .groupBy("grp_a", "grp_b", "v")
        .agg(
            F.min("h").alias("h"),
            F.max(
                F.when(F.col(group_col) == F.col("grp_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col(group_col) == F.col("grp_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    w = Window.partitionBy("grp_a", "grp_b").orderBy("h", "v")
    ranked = rows.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = ranked.groupBy("grp_a", "grp_b").agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("h").alias("kth_hash"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("matches"),
    )
    return agg.select(
        "grp_a",
        "grp_b",
        "k_used",
        "matches",
        F.when(F.col("k_used") < k, F.col("k_used"))
        .otherwise(F.expr(f"{(k - 1) * KMV_M}L div kth_hash"))
        .cast("long")
        .alias("est_union"),
    ).select(
        "grp_a",
        "grp_b",
        "k_used",
        "matches",
        "est_union",
        F.expr("matches * est_union div k_used").cast("long").alias(
            "est_intersection"
        ),
        F.expr("matches * 1000000L div k_used").cast("long").alias(
            "jaccard_micro"
        ),
    )


CM_DEPTH = 4  # independent hash rows
CM_WIDTH = 256  # buckets per row (power of two)


def countmin_build(
    df: DataFrame,
    *,
    value_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a value
    stream: a fixed depth×width counter table — here depth rows of
    width buckets, ~{CM_DEPTH}×{CM_WIDTH} integers regardless of input
    size. Mergeable by element-wise addition, which is what makes it
    the streaming/windowed frequency-estimate state (O(d·w), never
    O(distinct)).

    Build shape at 100 TB: one explode to (row, bucket) pairs — depth
    narrow integer rows per input value, all map-side — then a
    partial-aggregated groupBy onto d·w cells. The exchange carries at
    most d·w distinct keys; the map-side combine absorbs the volume.

    Output: (cm_row, cm_bucket, cnt).
    """
    from openstack_billing_from_db_spark.functions.hashing import seeded_hash64

    cells = df.select(
        F.posexplode(
            F.array(
                *[
                    seeded_hash64(F.col(value_col).cast("string"), f"cm{i}") % width
                    for i in range(depth)
                ]
            )
        ).alias("cm_row", "cm_bucket")
    )
    return cells.groupBy("cm_row", "cm_bucket").agg(F.count(F.lit(1)).alias("cnt"))


def countmin_probe(
    sketch: DataFrame,
    probes: DataFrame,
    *,
    value_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-frequency estimates from a count-min sketch: for each probe
    value, the MIN over its depth counters — an overestimate by
    construction (collisions only add), so ``est_count >= true count``
    always. The probe side explodes to (probe, row, bucket) and joins
    the d·w-row sketch — broadcastable by definition; the probe set is
    typically small (heavy-hitter candidates).

    Output: probes' columns + est_count.
    """
    from openstack_billing_from_db_spark.functions.hashing import seeded_hash64

    pb = probes.select(
        "*",
        F.posexplode(
            F.array(
                *[
                    seeded_hash64(F.col(value_col).cast("string"), f"cm{i}") % width
                    for i in range(depth)
                ]
            )
        ).alias("cm_row", "cm_bucket"),
    )
    others = [c for c in probes.columns]
    joined = pb.join(F.broadcast(sketch), ["cm_row", "cm_bucket"])
    return joined.groupBy(*others).agg(F.min("cnt").alias("est_count"))


def countmin_cell_sql(expr: str, i: int, width: int = CM_WIDTH) -> str:
    """DuckDB twin of one count-min cell coordinate for seed row i."""
    from openstack_billing_from_db_spark.functions.hashing import seeded_hash64_sql

    return f"{seeded_hash64_sql(expr, f'cm{i}')} % {width}"


def kmv_distinct_sql(
    *,
    from_distinct_cte: str,
    group_col: str,
    k: int,
) -> str:
    """DuckDB twin of :func:`kmv_distinct`, reading a CTE named
    ``from_distinct_cte`` with columns (group_col, v) already DISTINCT.
    Emitted as a full SELECT so callers splice it after their WITH chain.
    """
    est = f"{(k - 1) * KMV_M} // max(CASE WHEN rn <= {k} THEN h END)"
    return f"""
SELECT {group_col},
       CAST(count(*) AS BIGINT) AS n_distinct_exact,
       CAST(sum(CASE WHEN rn <= {k} THEN 1 ELSE 0 END) AS BIGINT) AS k_used,
       max(CASE WHEN rn <= {k} THEN h END) AS kth_hash,
       CAST(CASE WHEN sum(CASE WHEN rn <= {k} THEN 1 ELSE 0 END) < {k}
                 THEN sum(CASE WHEN rn <= {k} THEN 1 ELSE 0 END)
                 ELSE {est} END AS BIGINT) AS est_distinct
FROM (
  SELECT {group_col}, v, h,
         row_number() OVER (PARTITION BY {group_col} ORDER BY h, v) AS rn
  FROM (SELECT {group_col}, v, {kmv_hash_sql("CAST(v AS VARCHAR)")} AS h
        FROM {from_distinct_cte})
)
GROUP BY {group_col}"""


# --- HyperLogLog ---------------------------------------------------------------

# Flajolet et al. 2007 ("HyperLogLog: the analysis of a near-optimal
# cardinality estimation algorithm"): hash each distinct value, use the
# low b bits as a register index and the position of the highest set
# bit of the rest as the register value; estimate by the normalized
# harmonic mean of 2^-register. CONSTANT state (m registers per group,
# vs KMV's k values) mergeable by per-register MAX — the union law that
# composes across partitions, files, and days. Engine-exact: the hash
# is the portable 52-bit md5 family; 2^-rho is computed as
# 1.0 / (1 << rho) (exact in IEEE double for rho <= 47), and the
# harmonic sum is a sum of multiples of 2^-46 bounded by m < 2^7 — at
# m=64 every partial sum fits 53 mantissa bits, so the double sum is
# EXACT and order-independent: both engines produce identical bits.
# Only the small-range linear-counting branch uses ln(); its output is
# milli-rounded (the q76 precedent absorbs libm ulp differences).

HLL_B = 6
HLL_M = 1 << HLL_B
HLL_REM_BITS = KMV_BITS - HLL_B  # 46 hash bits feed the register value
HLL_ALPHA = 0.709  # the standard alpha_64 constant


def _hll_reg_rho(df, *, group_col: str, value_col: str) -> DataFrame:
    """(group, reg, rho) row per DISTINCT input value — the shared
    register-construction stage under hll_registers and hll_distinct."""
    hashed = (
        df.select(group_col, value_col)
        .distinct()
        .select(
            group_col,
            kmv_hash(F.col(value_col).cast("string")).alias("h"),
        )
    )
    return hashed.select(
        group_col,
        F.expr(f"h % {HLL_M}").alias("reg"),
        F.expr(
            f"{HLL_REM_BITS + 1} - CASE WHEN h div {HLL_M} = 0 THEN 0 "
            f"ELSE length(bin(h div {HLL_M})) END"
        ).alias("rho"),
    )


# the shared finalize expression over (n_registers_used, z_seen):
# harmonic-mean raw estimate, or linear counting in the small range —
# ONE definition so hll_estimate (streaming read) and hll_distinct
# (batch) cannot drift apart
_HLL_EST_MILLI_SQL = (
    f"CAST(floor(CASE WHEN "
    f"({HLL_ALPHA} * {HLL_M} * {HLL_M}) / (({HLL_M} - n_registers_used) + z_seen)"
    f"   <= 2.5 * {HLL_M} AND n_registers_used < {HLL_M} "
    f"THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - n_registers_used)) "
    f"ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M}) / (({HLL_M} - n_registers_used) + z_seen) "
    f"END * 1000 + 0.5) AS BIGINT)"
)


def hll_registers(
    df: DataFrame, *, group_col: str, value_col: str
) -> DataFrame:
    """The mergeable HLL state for one slice: per (group, register), the
    max leading-zero rank over the slice's DISTINCT values. At most
    HLL_M rows per group, whatever the slice size. Slices compose by
    groupBy(group, reg).max(rho) — :func:`hll_merge`;
    :func:`hll_estimate` turns state into estimates.
    Output: (group, reg, rho)."""
    return (
        _hll_reg_rho(df, group_col=group_col, value_col=value_col)
        .groupBy(group_col, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(parts: DataFrame, *, group_col: str) -> DataFrame:
    """Union-of-slices → the union's HLL state: per-register MAX.
    ``merge(registers(A), registers(B)) ≡ registers(A ∪ B)`` — pinned
    by test_sketch_ops."""
    return parts.groupBy(group_col, "reg").agg(F.max("rho").alias("rho"))


def hll_estimate(regs: DataFrame, *, group_col: str) -> DataFrame:
    """HLL state → per-group cardinality estimate
    (group, n_registers_used, est_milli). Unseen registers contribute
    2^0 = 1 to the harmonic sum, so they never materialize:
    Z = (m − seen) + Σ_seen 2^-rho. Small-range (raw ≤ 2.5m with empty
    registers) switches to linear counting m·ln(m/V)."""
    agg = regs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers_used"),
        F.sum(F.expr("1.0 / CAST(shiftleft(1L, rho) AS DOUBLE)")).alias("z_seen"),
    )
    return agg.select(
        group_col,
        "n_registers_used",
        F.expr(_HLL_EST_MILLI_SQL).alias("est_milli"),
    )


def hll_distinct(
    df: DataFrame, *, group_col: str, value_col: str
) -> DataFrame:
    """Per-group HLL distinct-count estimate with the exact count
    alongside: (group, n_distinct_exact, n_registers_used, est_milli).

    ONE pass over the reduced distinct stream: the (group, register)
    aggregation carries a row count per register, and summing those
    counts IS the exact distinct count (the stream is distinct by
    construction) — so exact and estimate come out of the same two
    cascaded aggregations with no join and no second scan. The final
    exchange is ≤ m rows per group regardless of volume."""
    regs = (
        _hll_reg_rho(df, group_col=group_col, value_col=value_col)
        .groupBy(group_col, "reg")
        .agg(F.max("rho").alias("rho"), F.count(F.lit(1)).alias("nv"))
    )
    agg = regs.groupBy(group_col).agg(
        F.sum("nv").cast("long").alias("n_distinct_exact"),
        F.count(F.lit(1)).cast("long").alias("n_registers_used"),
        F.sum(F.expr("1.0 / CAST(shiftleft(1L, rho) AS DOUBLE)")).alias("z_seen"),
    )
    return agg.select(
        group_col,
        "n_distinct_exact",
        "n_registers_used",
        F.expr(_HLL_EST_MILLI_SQL).alias("est_milli"),
    )


def hll_distinct_sql(
    *,
    from_distinct_cte: str,
    group_col: str,
) -> str:
    """DuckDB twin of :func:`hll_distinct`, reading a CTE named
    ``from_distinct_cte`` with columns (group_col, v) already DISTINCT."""
    m = HLL_M
    a = HLL_ALPHA
    raw = f"({a} * {m} * {m}) / (({m} - n_registers_used) + z_seen)"
    return f"""
SELECT e.{group_col}, e.n_distinct_exact, s.n_registers_used,
       CAST(floor(CASE WHEN {raw} <= 2.5 * {m} AND n_registers_used < {m}
                  THEN {m} * ln(CAST({m} AS DOUBLE) / ({m} - n_registers_used))
                  ELSE {raw} END * 1000 + 0.5) AS BIGINT) AS est_milli
FROM (
  SELECT {group_col}, CAST(count(*) AS BIGINT) AS n_registers_used,
         sum(1.0 / CAST((1::BIGINT << rho) AS DOUBLE)) AS z_seen
  FROM (
    SELECT {group_col}, reg, max(rho) AS rho FROM (
      SELECT {group_col}, h % {m} AS reg,
             {HLL_REM_BITS + 1} - CASE WHEN h // {m} = 0 THEN 0
                                       ELSE length(bin(h // {m})) END AS rho
      FROM (SELECT {group_col}, {kmv_hash_sql("CAST(v AS VARCHAR)")} AS h
            FROM {from_distinct_cte})
    ) GROUP BY {group_col}, reg
  ) GROUP BY {group_col}
) s JOIN (
  SELECT {group_col}, CAST(count(*) AS BIGINT) AS n_distinct_exact
  FROM {from_distinct_cte} GROUP BY {group_col}
) e USING ({group_col})"""


# --- AMS second-moment (F2 / self-join size) sketch --------------------------

AMS_D = 9  # estimator count; odd so the finalize is an exact median


def ams_sign(col: Column, j: int) -> Column:
    """±1 four-wise-ish sign for estimator ``j`` from the portable
    hash's parity bit — identical in DuckDB via :func:`ams_sign_sql`."""
    return 1 - 2 * (
        kmv_hash(F.concat(col.cast("string"), F.lit(f"#ams{j}"))) % 2
    )


def ams_sign_sql(expr: str, j: int) -> str:
    hashed = kmv_hash_sql(f"concat(CAST({expr} AS VARCHAR), '#ams{j}')")
    return f"1 - 2 * ({hashed} % 2)"


def ams_f2(df: DataFrame, *, value_col: str) -> DataFrame:
    """AMS "tug-of-war" estimate of the second frequency moment
    F2 = Σ_k f_k² (Alon-Matias-Szegedy 1996) next to the exact value —
    F2 of a join key IS the self-join size, so this is the constant-
    state answer to "how big would this join get?" *before* paying for
    the join (the planner-input sibling of the q122 count-min and q114
    recall evals).

    Each estimator j keeps one running BIGINT Z_j = Σ_rows s_j(key)
    with s_j ∈ {−1,+1}; E[Z_j²] = F2. All AMS_D partial sums ride ONE
    map-side aggregation of the scan (no explode — the row fans out
    into 9 sign columns, each partially summed); the finalize is an
    exact median of the 9 squares on a single row. The exact side is
    the vocabulary-sized groupBy it exists to predict.

    Overflow bound: |Z_j| ≤ n_rows, so Z² fits BIGINT up to ~3·10⁹
    rows per slice; beyond that compute per-slice sketches and merge
    (Z is additive across slices) before squaring. The error ratio is
    computed in DOUBLE (est−exact can exceed BIGINT·10⁴ headroom at
    large F2; a float ratio of two ≤2⁶³ ints is deterministic across
    engines). NULL keys are EXCLUDED on both sides — a NULL join key
    matches nothing, so it contributes nothing to self-join size.

    Output: one row (n_rows, f2_exact, f2_est, rel_err_bp)."""
    src = df.select(F.col(value_col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    z = src.agg(
        *[
            F.sum(ams_sign(F.col("v"), j)).cast("long").alias(f"z{j}")
            for j in range(AMS_D)
        ]
    )
    mid = AMS_D // 2 + 1  # 1-indexed middle element
    est = z.select(
        F.expr(
            "element_at(sort_array(array("
            + ", ".join(f"z{j} * z{j}" for j in range(AMS_D))
            + f")), {mid})"
        ).alias("f2_est")
    )
    exact = (
        src.groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0))
            .cast("long")
            .alias("f2_exact"),
        )
    )
    # 1-row × 1-row combine
    return exact.crossJoin(est).select(
        "n_rows",
        "f2_exact",
        "f2_est",
        F.expr(
            "CAST(CASE WHEN f2_exact = 0 THEN 0 "
            "ELSE floor(abs(CAST(f2_est AS DOUBLE) - CAST(f2_exact AS DOUBLE)) "
            "/ CAST(f2_exact AS DOUBLE) * 10000) END AS BIGINT)"
        ).alias("rel_err_bp"),
    )


def ams_f2_sql(*, from_cte: str, value_expr: str) -> str:
    """DuckDB twin of :func:`ams_f2` over ``from_cte`` (any relation)
    with key expression ``value_expr``."""
    mid = AMS_D // 2 + 1
    zsums = ",\n       ".join(
        f"CAST(sum({ams_sign_sql(value_expr, j)}) AS BIGINT) AS z{j}"
        for j in range(AMS_D)
    )
    squares = ", ".join(f"z{j} * z{j}" for j in range(AMS_D))
    return f"""
src_nn AS (SELECT * FROM {from_cte} WHERE {value_expr} IS NOT NULL),
z AS (SELECT {zsums} FROM src_nn),
ex AS (
  SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_rows,
         CAST(coalesce(sum(c * c), 0) AS BIGINT) AS f2_exact
  FROM (SELECT count(*) AS c FROM src_nn GROUP BY CAST({value_expr} AS VARCHAR))
),
m AS (SELECT (list_sort([{squares}]))[{mid}] AS f2_est FROM z)
SELECT n_rows, f2_exact, f2_est,
       CAST(CASE WHEN f2_exact = 0 THEN 0
            ELSE floor(abs(CAST(f2_est AS DOUBLE) - CAST(f2_exact AS DOUBLE))
                 / CAST(f2_exact AS DOUBLE) * 10000) END AS BIGINT) AS rel_err_bp
FROM ex, m"""
