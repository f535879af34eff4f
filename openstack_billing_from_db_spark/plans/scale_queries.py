"""Round-4 scale-kernel registry entries: histogram quantiles, per-group
weighted sampling, degree-oriented triangle counting, skew-salted joins,
and random-projection dimensionality reduction.

Each is a (Spark plan, DuckDB oracle) pair per the registry.py contract.
The reference (CCI-MOC/openstack-billing-from-db) has none of these —
beyond-reference components targeting the specific hazards of a
1000-executor run: skewed join keys (q107), skewed vertex degrees
(q106), corpus-wide percentile scans (q103), whole-stratum sample
starvation (q105), and shuffle-width of wide embeddings (q104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.operators.parallelism import (
    ensure_map_parallelism,
)
from openstack_billing_from_db_spark.registry import register
from openstack_billing_from_db_spark.sources.tables import load_table


# --- histogram quantile sketch ------------------------------------------------

_HQ_BIN = 64
_HQ_P = (500_000, 900_000, 990_000)


def _hq_oracle() -> str:
    from openstack_billing_from_db_spark.operators.quantiles import (
        histogram_quantiles_sql,
    )

    inner = histogram_quantiles_sql(
        from_cte="vals", group_col="source", bin_width=_HQ_BIN, p_micro=_HQ_P
    )
    return f"""
WITH vals AS (SELECT source, CAST(n_chars AS BIGINT) AS val FROM documents)
{inner}"""


@register("q103_histogram_quantiles", oracle=_hq_oracle())
def q103_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length percentiles (p50/p90/p99) from the
    mergeable fixed-width histogram sketch (operators/quantiles.py),
    exact ranks alongside for accuracy inspection. The sketch path: one
    partial-aggregated groupBy onto (source, length div {_HQ_BIN}) cells
    — the exchange carries bins, not rows — then windows over the cell
    table; ``percentile_approx`` (JVM-internal GK) can't be
    oracle-replayed, integer bin arithmetic can. est ≥ exact and
    est − exact < {_HQ_BIN} always."""
    from openstack_billing_from_db_spark.operators.quantiles import (
        histogram_quantiles,
    )

    docs = ensure_map_parallelism(
        load_table(spark, sf_dir, "documents").select("source", "n_chars")
    )
    return histogram_quantiles(
        docs,
        group_col="source",
        value_col="n_chars",
        bin_width=_HQ_BIN,
        p_micro=_HQ_P,
    )


# --- random-projection dimensionality reduction ------------------------------

_RP_OUT = 8
_RP_DIMS = 64


def _rp_oracle() -> str:
    from openstack_billing_from_db_spark.operators.similarity import (
        hyperplane_signs,
    )

    signs = hyperplane_signs(_RP_OUT, _RP_DIMS)
    cols = ",\n       ".join(
        "list_inner_product(embedding::DOUBLE[], ["
        + ", ".join(str(v) for v in signs[j])
        + f"]::DOUBLE[]) AS y{j}"
        for j in range(_RP_OUT)
    )
    return f"""
SELECT vec_id,
       {cols}
FROM embeddings"""


@register("q104_random_projection", oracle=_rp_oracle())
def q104_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_RP_DIMS}→{_RP_OUT}-dim Johnson-Lindenstrauss reduction of the
    embedding corpus via deterministic ±1 hyperplanes
    (operators/similarity.random_projection — the continuous complement
    of the sign-LSH bucket bits). Pure map-side: no shuffle, no UDF,
    scan pruned to (vec_id, embedding); downstream ANN/k-means runs at
    {_RP_OUT}/{_RP_DIMS} of the shuffle width. Left-to-right array folds
    make the doubles bit-identical to DuckDB's list_inner_product."""
    from openstack_billing_from_db_spark.operators.similarity import (
        random_projection,
    )

    emb = ensure_map_parallelism(load_table(spark, sf_dir, "embeddings"))
    return random_projection(emb, out_dims=_RP_OUT, dims=_RP_DIMS)


# --- per-group weighted priority sampling ------------------------------------

_GPS_K = 5


@register(
    "q105_group_priority_sample",
    oracle=f"""
WITH w AS (
  SELECT o_orderpriority, o_orderkey AS key,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS weight
  FROM orders
),
p AS (
  SELECT o_orderpriority, key, weight,
         CAST(concat('0x', substr(md5(concat('pri|', CAST(key AS VARCHAR))), 1, 15)) AS BIGINT)
           // weight AS priority
  FROM w
)
SELECT o_orderpriority, key AS o_orderkey, weight AS weight_cents, priority, rnk
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY priority, key) AS BIGINT) AS rnk
      FROM p)
WHERE rnk <= {_GPS_K}
""",
)
def q105_group_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_GPS_K} weighted priority sample WITHIN each order priority
    class (operators/sampling.priority_sample_per_group): stratified
    Duffield-Lund-Thorup sampling, every stratum guaranteed
    representation — the global top-k (q99) can starve small strata.
    Plan: map-side priority projection → one hash exchange on the
    stratum key → bounded rank-≤-k window; output ≤ k rows per stratum
    regardless of input size."""
    from openstack_billing_from_db_spark.operators.sampling import (
        priority_sample_per_group,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "weight"
        ),
    )
    out = priority_sample_per_group(
        orders,
        group_col="o_orderpriority",
        key_col="o_orderkey",
        weight_col="weight",
        k=_GPS_K,
    )
    return out.select(
        "o_orderpriority",
        F.col("key").alias("o_orderkey"),
        F.col("weight").alias("weight_cents"),
        "priority",
        "rnk",
    )


# --- degree-oriented triangle counting ---------------------------------------

_ORD = 1 << 40


@register(
    "q106_triangle_count",
    oracle=f"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
e0 AS (SELECT DISTINCT x.p AS a, y.p AS b FROM li x JOIN li y
       ON x.ok = y.ok AND x.p < y.p),
deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM
        (SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0) GROUP BY v),
ww AS (SELECT e0.a, e0.b,
              da.deg * {_ORD} + e0.a AS orda,
              db.deg * {_ORD} + e0.b AS ordb
       FROM e0 JOIN deg da ON da.v = e0.a JOIN deg db ON db.v = e0.b),
d AS (SELECT CASE WHEN orda < ordb THEN a ELSE b END AS src,
             CASE WHEN orda < ordb THEN b ELSE a END AS dst,
             CASE WHEN orda < ordb THEN ordb ELSE orda END AS dst_ord
      FROM ww),
wedges AS (SELECT e1.dst AS wv, e2.dst AS wd
           FROM d e1 JOIN d e2 ON e1.src = e2.src AND e1.dst_ord < e2.dst_ord)
SELECT
  (SELECT CAST(count(DISTINCT v) AS BIGINT) FROM
     (SELECT src AS v FROM d UNION ALL SELECT dst AS v FROM d)) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_edges,
  (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS n_wedges,
  (SELECT CAST(count(*) AS BIGINT) FROM wedges w
     JOIN d ON d.src = w.wv AND d.dst = w.wd) AS n_triangles
""",
)
def q106_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the part co-purchase graph (parts sharing
    an order are adjacent) via degree-oriented wedge joining
    (operators/graph.triangle_stats — Suri & Vassilvitskii 2011). The
    scale point: after orientation every out-degree is O(sqrt(m)), so
    the wedge self-join is bounded even when raw degrees are wildly
    skewed (a best-seller part touching every order). Edge build is
    per-order pairing — bounded by the per-order item count, never a
    corpus self-join."""
    from openstack_billing_from_db_spark.operators.graph import triangle_stats

    li = (
        ensure_map_parallelism(
            load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        )
        .distinct()
    )
    edges = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
    )
    return triangle_stats(edges)


# --- skew-salted join --------------------------------------------------------

_N_SALTS = 8


@register(
    "q107_salted_join_revenue",
    oracle="""
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
)
def q107_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by part brand through a SALTED shuffled-hash join
    (operators/joins.salted_join): the part side is replicated
    {_N_SALTS}× and lineitem rows scatter across the replicas by a
    row-local hash of (orderkey, linenumber) — the defense for the join
    AQE's skew splitter does not cover (shuffled-hash, or a hot key
    beyond block granularity). Result is structurally identical to the
    plain join (every fact row meets exactly one replica of its dim
    row), which is exactly what the unsalted oracle pins."""
    from openstack_billing_from_db_spark.operators.joins import salted_join

    # byte-proportional map work (one hash + projection per row): a
    # sub-32 MB scan needs no pre-balancing — the join's own (key, salt)
    # shuffle spreads the rows anyway, so the round-robin exchange was a
    # pure extra pass over the fact side
    li = ensure_map_parallelism(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_extendedprice",
            "l_discount",
        ),
        skip_below_bytes=32 << 20,
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li,
        part.withColumnRenamed("p_partkey", "l_partkey"),
        key="l_partkey",
        salt_from=F.concat_ws("_", "l_orderkey", "l_linenumber"),
        n_salts=_N_SALTS,
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(8,2)"))
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(rev).cast("double").alias("revenue"),
    )


# --- sketch-driven outlier trim ----------------------------------------------


def _trim_oracle() -> str:
    from openstack_billing_from_db_spark.operators.quantiles import (
        histogram_quantiles_sql,
    )

    est = histogram_quantiles_sql(
        from_cte="vals",
        group_col="source",
        bin_width=_HQ_BIN,
        p_micro=(990_000,),
        with_exact=False,
    )
    return f"""
WITH vals AS (SELECT source, CAST(n_chars AS BIGINT) AS val FROM documents),
est AS ({est})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN d.n_chars <= e.p99_est THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN d.n_chars > e.p99_est THEN 1 ELSE 0 END) AS BIGINT) AS n_trimmed,
       e.p99_est
FROM documents d JOIN est e USING (source)
GROUP BY d.source, e.p99_est
"""


@register("q108_quantile_trim", oracle=_trim_oracle())
def q108_quantile_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-outlier trimming driven BY the quantile sketch: each
    source's p99 length estimate (one sketch row per source) broadcasts
    back against the corpus and gates each document — the composition
    that makes q103 a pipeline stage rather than a report. At 100 TB the
    corpus is scanned twice (cell build + filter) and shuffled never;
    the sketch side is groups-sized by construction."""
    from openstack_billing_from_db_spark.operators.quantiles import (
        histogram_cells,
        quantiles_from_cells,
    )

    docs = ensure_map_parallelism(
        load_table(spark, sf_dir, "documents").select("source", "n_chars")
    )
    est = quantiles_from_cells(
        histogram_cells(
            docs, group_col="source", value_col="n_chars", bin_width=_HQ_BIN
        ),
        group_col="source",
        bin_width=_HQ_BIN,
        p_micro=(990_000,),
    ).select("source", "p99_est")
    joined = docs.join(F.broadcast(est), "source")
    return joined.groupBy("source", "p99_est").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_chars") <= F.col("p99_est"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("n_chars") > F.col("p99_est"), 1).otherwise(0))
        .cast("long")
        .alias("n_trimmed"),
    ).select("source", "n_docs", "n_kept", "n_trimmed", "p99_est")


# --- per-document contamination fraction -------------------------------------


def _contamination_oracle() -> str:
    from openstack_billing_from_db_spark.functions.hashing import seeded_hash64_sql
    from openstack_billing_from_db_spark.operators.curation import WORDS_SQL as _W
    from openstack_billing_from_db_spark.plans.corpus_queries import _DECON_N

    eval_hash = seeded_hash64_sql("CAST(doc_id AS VARCHAR)", "eval")
    gh = seeded_hash64_sql("ng", "ng")
    return f"""
WITH wrd AS (SELECT doc_id, {_W} AS w FROM documents),
g AS (
  SELECT DISTINCT doc_id, {gh} AS gh
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - {_DECON_N - 2}),
                                 i -> array_to_string(w[i:i+{_DECON_N - 1}], ' '))) AS ng
    FROM wrd WHERE len(w) >= {_DECON_N}
  )
),
ev AS (SELECT DISTINCT gh FROM g WHERE {eval_hash} % 20 = 0),
tr AS (SELECT doc_id, gh FROM g WHERE {eval_hash} % 20 != 0)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN e.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       CAST(sum(CASE WHEN e.gh IS NOT NULL THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS contamination_bp
FROM tr t LEFT JOIN ev e ON t.gh = e.gh
GROUP BY t.doc_id
"""


@register("q109_contamination_fraction", oracle=_contamination_oracle())
def q109_contamination_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-training-document contamination SCORE: the fraction of its
    distinct 4-gram shingles that appear anywhere in the held-out eval
    slice (GPT-3-appendix-style overlap accounting), in basis points —
    the keep/drop signal q68's pairwise shared-gram counts feed into.
    Scale shape: same narrow (doc_id, gram-hash) stream as q68; the eval
    side collapses to DISTINCT gram hashes, and the scoring join is a
    left join + conditional count, partial-aggregated per doc. The join
    strategy is left to AQE: a benchmark-suite eval set broadcasts, a
    5%-of-corpus eval slice (this synthetic setup at scale) exceeds any
    executor and must shuffle — forcing a broadcast hint here would OOM
    at 100 TB. Isolated x100: 79.7x wall for 100x input AND output —
    linear work on fixed cores (both gram streams grow with the data)."""
    from openstack_billing_from_db_spark.functions.hashing import seeded_hash64
    from openstack_billing_from_db_spark.operators import text
    from openstack_billing_from_db_spark.plans.corpus_queries import _DECON_N

    docs = load_table(spark, sf_dir, "documents")
    grams = (
        ensure_map_parallelism(docs.select("doc_id", "text"))
        .select(
            "doc_id",
            F.explode(
                text.word_shingles(text.words(F.col("text")), _DECON_N)
            ).alias("ng"),
        )
        .select("doc_id", seeded_hash64(F.col("ng"), "ng").alias("gh"))
        .distinct()
    )
    is_eval = seeded_hash64(F.col("doc_id").cast("string"), "eval") % 20 == 0
    ev = grams.filter(is_eval).select("gh").distinct().withColumn("hit", F.lit(1))
    tr = grams.filter(~is_eval)
    return tr.join(ev, "gh", "left").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_contaminated"),
        F.expr("CAST(sum(coalesce(hit, 0)) * 10000 div count(1) AS BIGINT)").alias(
            "contamination_bp"
        ),
    )


# --- product quantization ----------------------------------------------------

_PQ_DIMS = 64
_PQ_M = 8  # subspaces
_PQ_K = 4  # codes per subspace
_PQ_ITER = 1
_PQ_DP = 6


def _pq_assign_sql(name: str, src: str, cents: str, out: str) -> str:
    return f"""{name} AS (
  SELECT vid, cid AS {out} FROM (
    SELECT co.vid, ce.cid, row_number() OVER (
      PARTITION BY co.vid
      ORDER BY list_inner_product(ce.c, ce.c) - 2 * list_inner_product(co.e, ce.c), ce.cid
    ) AS rn
    FROM {src} co CROSS JOIN {cents} ce
  ) WHERE rn = 1
)"""


def _pq_train_blocks(vec_src: str) -> list[str]:
    """Per-subspace Lloyd training + encode CTE blocks (s{m}, c*_{m},
    code_{m}), slicing vectors from CTE ``vec_src`` (columns vid, e)."""
    sd = _PQ_DIMS // _PQ_M
    assign = _pq_assign_sql
    blocks = []
    for m in range(_PQ_M):
        lo, hi = m * sd + 1, (m + 1) * sd
        blocks.append(f"s{m} AS (SELECT vid, e[{lo}:{hi}] AS e FROM {vec_src})")
        blocks.append(
            f"c0_{m} AS (SELECT row_number() OVER (ORDER BY vid) - 1 AS cid, e AS c "
            f"FROM (SELECT vid, e FROM s{m} ORDER BY vid LIMIT {_PQ_K}))"
        )
        cur = f"c0_{m}"
        for it in range(1, _PQ_ITER + 1):
            blocks.append(assign(f"a{it}_{m}", f"s{m}", cur, "cluster"))
            blocks.append(
                f"""u{it}_{m} AS (
  SELECT cluster AS cid, list(v ORDER BY pos) AS c FROM (
    SELECT cluster, pos, floor(avg(val) * 1e{_PQ_DP} + 0.5) / 1e{_PQ_DP} AS v
    FROM (
      SELECT a.cluster, unnest(co.e) AS val, generate_subscripts(co.e, 1) AS pos
      FROM a{it}_{m} a JOIN s{m} co USING (vid)
    ) GROUP BY cluster, pos
  ) GROUP BY cluster
)"""
            )
            blocks.append(
                f"c{it}_{m} AS (SELECT p.cid, coalesce(u.c, p.c) AS c "
                f"FROM {cur} p LEFT JOIN u{it}_{m} u USING (cid))"
            )
            cur = f"c{it}_{m}"
        blocks.append(assign(f"code_{m}", f"s{m}", cur, f"c{m}"))
    return blocks


def _pq_oracle() -> str:
    """Per-subspace replay of the deterministic Lloyd training
    (mirroring plans/pipeline_queries._kmeans_oracle, namespaced per
    subspace over SLICED vectors) followed by the nearest-code encode."""
    blocks = [
        "corpus AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS e FROM embeddings)"
    ] + _pq_train_blocks("corpus")
    ctes = ",\n".join(blocks)
    joins = "\n".join(f"JOIN code_{m} USING (vid)" for m in range(_PQ_M))
    cols = ", ".join(f"CAST(c{m} AS BIGINT) AS c{m}" for m in range(_PQ_M))
    return f"""
WITH {ctes}
SELECT vid AS vec_id, {cols}
FROM corpus
{joins}"""


@register("q110_pq_encode", oracle=_pq_oracle())
def q110_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (Jégou et al. 2011,
    operators/quantization.py): {_PQ_M} codebooks of {_PQ_K} centroids
    trained per contiguous {_PQ_DIMS // _PQ_M}-dim subspace with the
    same deterministic Lloyd machinery as q73, then every vector
    compressed to its {_PQ_M} nearest-centroid codes — 64 doubles down
    to {_PQ_M} small ints, the embedding-payload compression that makes
    a 10^9-vector ANN scan broadcast codebooks instead of reshuffling
    raw vectors. Training: M shared-scan kmeans_fit runs; encoding: one
    map-side projection over driver-literal codebooks (no shuffle, no
    UDF). The oracle replays training AND encoding per subspace."""
    from openstack_billing_from_db_spark.operators.quantization import (
        pq_encode,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(
        emb,
        dims=_PQ_DIMS,
        n_subspaces=_PQ_M,
        k=_PQ_K,
        n_iter=_PQ_ITER,
        round_dp=_PQ_DP,
    )
    return pq_encode(emb, books)


_ADC_NQ = 10
_ADC_TOPK = 5


def _pq_adc_oracle() -> str:
    """Training CTEs from :func:`_pq_oracle`, then asymmetric-distance
    scoring: every neighbor's per-subspace centroid joined via its code,
    distance = the same left-to-right (x−y)² fold Spark computes
    (list_sum over an index-lambda difference — NOT the expanded
    a²−2ab+b² form, which rounds differently)."""
    sd = _PQ_DIMS // _PQ_M
    train = _pq_oracle()
    ctes = train.split("WITH ", 1)[1].rsplit("\nSELECT vid AS vec_id", 1)[0]
    cur = f"c{_PQ_ITER}_"  # final centroid CTE prefix per subspace
    nb_joins = "\n  ".join(
        f"JOIN code_{m} v{m} USING (vid) JOIN {cur}{m} b{m} ON b{m}.cid = v{m}.c{m}"
        for m in range(_PQ_M)
    )
    nb_cols = ", ".join(f"b{m}.c AS cc{m}" for m in range(_PQ_M))
    dist = " + ".join(
        f"list_sum(list_transform(range(1, {sd + 1}), "
        f"i -> (q.e[{m * sd}+i] - n.cc{m}[i]) * (q.e[{m * sd}+i] - n.cc{m}[i])))"
        for m in range(_PQ_M)
    )
    return f"""
WITH {ctes},
nb AS (
  SELECT co.vid, {nb_cols}
  FROM corpus co
  {nb_joins}
),
q AS (SELECT vid AS query_id, e FROM corpus ORDER BY vid LIMIT {_ADC_NQ}),
scored AS (
  SELECT q.query_id, n.vid AS neighbor_id,
         {dist} AS adist
  FROM q CROSS JOIN nb n WHERE n.vid != q.query_id
)
SELECT query_id, neighbor_id, rn FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY adist, neighbor_id) AS BIGINT) AS rn
  FROM scored
) WHERE rn <= {_ADC_TOPK}"""


@register("q111_pq_adc_topk", oracle=_pq_adc_oracle())
def q111_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-{_ADC_TOPK} over the PQ-compressed corpus
    (operators/quantization.pq_adc_topk): uncompressed query vectors vs
    {_PQ_M}-code rows — the corpus's raw embeddings are touched only by
    the one-time encode; the ANN scan itself reads narrow code columns
    and broadcast codebooks. At 10^9 vectors this is the 64×-smaller
    scan that makes a full-corpus ANN sweep feasible; composes with IVF
    (q65) for the bucketed variant. Rank-only output, ties by
    neighbor_id — same contract as q38/q39/q65."""
    from openstack_billing_from_db_spark.operators.quantization import (
        pq_adc_topk,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(
        emb,
        dims=_PQ_DIMS,
        n_subspaces=_PQ_M,
        k=_PQ_K,
        n_iter=_PQ_ITER,
        round_dp=_PQ_DP,
    )
    return pq_adc_topk(emb, books, n_queries=_ADC_NQ, topk=_ADC_TOPK)


_IVFPQ_CELLS = 4
_IVFPQ_PROBE = 2


def _coarse_blocks() -> str:
    """Coarse-quantizer Lloyd replay over FULL vectors (gc0..gc1) plus
    the final cell assignment (gcell) — shared by the IVF-PQ oracles."""
    return f"""gc0 AS (SELECT row_number() OVER (ORDER BY vid) - 1 AS cid, e AS c
  FROM (SELECT vid, e FROM corpus ORDER BY vid LIMIT {_IVFPQ_CELLS})),
{_pq_assign_sql("ga1", "corpus", "gc0", "cluster")},
gu1 AS (
  SELECT cluster AS cid, list(v ORDER BY pos) AS c FROM (
    SELECT cluster, pos, floor(avg(val) * 1e{_PQ_DP} + 0.5) / 1e{_PQ_DP} AS v
    FROM (
      SELECT a.cluster, unnest(co.e) AS val, generate_subscripts(co.e, 1) AS pos
      FROM ga1 a JOIN corpus co USING (vid)
    ) GROUP BY cluster, pos
  ) GROUP BY cluster
),
gc1 AS (SELECT p.cid, coalesce(u.c, p.c) AS c FROM gc0 p LEFT JOIN gu1 u USING (cid)),
{_pq_assign_sql("gcell", "corpus", "gc1", "cell")}"""


def _ivf_pq_oracle() -> str:
    """Coarse-quantizer Lloyd replay over FULL vectors (namespaced g*)
    + the per-subspace PQ training CTEs from :func:`_pq_oracle`, then:
    probe = each query's {_IVFPQ_PROBE} nearest cells, candidates =
    probed cells' members, distance = the q111 (x−y)² fold."""
    sd = _PQ_DIMS // _PQ_M
    train = _pq_oracle()
    pq_ctes = train.split("WITH ", 1)[1].rsplit("\nSELECT vid AS vec_id", 1)[0]

    coarse = _coarse_blocks()

    nb_joins = "\n  ".join(
        f"JOIN code_{m} v{m} USING (vid) JOIN c{_PQ_ITER}_{m} b{m} ON b{m}.cid = v{m}.c{m}"
        for m in range(_PQ_M)
    )
    nb_cols = ", ".join(f"b{m}.c AS cc{m}" for m in range(_PQ_M))
    dist = " + ".join(
        f"list_sum(list_transform(range(1, {sd + 1}), "
        f"i -> (q.e[{m * sd}+i] - n.cc{m}[i]) * (q.e[{m * sd}+i] - n.cc{m}[i])))"
        for m in range(_PQ_M)
    )
    return f"""
WITH {pq_ctes},
{coarse},
nb AS (
  SELECT co.vid, g.cell, {nb_cols}
  FROM corpus co JOIN gcell g USING (vid)
  {nb_joins}
),
q AS (SELECT vid AS query_id, e FROM corpus ORDER BY vid LIMIT {_ADC_NQ}),
probe AS (
  SELECT query_id, cid AS cell FROM (
    SELECT q.query_id, ce.cid, row_number() OVER (
      PARTITION BY q.query_id
      ORDER BY list_inner_product(ce.c, ce.c) - 2 * list_inner_product(q.e, ce.c), ce.cid
    ) AS rn
    FROM q CROSS JOIN gc1 ce
  ) WHERE rn <= {_IVFPQ_PROBE}
),
scored AS (
  SELECT q.query_id, n.vid AS neighbor_id,
         {dist} AS adist
  FROM q JOIN probe p USING (query_id)
  JOIN nb n ON n.cell = p.cell AND n.vid != q.query_id
)
SELECT query_id, neighbor_id, rn FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY adist, neighbor_id) AS BIGINT) AS rn
  FROM scored
) WHERE rn <= {_ADC_TOPK}"""


@register("q112_ivf_pq_topk", oracle=_ivf_pq_oracle())
def q112_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-{_ADC_TOPK} (operators/quantization.ivf_pq_topk): the
    full billion-scale ANN composition — a {_IVFPQ_CELLS}-cell coarse
    quantizer partitions the corpus into inverted lists; each query
    probes its {_IVFPQ_PROBE} nearest cells and scans ONLY those cells'
    PQ codes with asymmetric distance. Candidate count falls by
    n_probe/cells and each candidate costs code-width reads — combining
    q65's pruning with q110's compression. Training, cell assignment,
    probing, and scoring all replay in the oracle."""
    from openstack_billing_from_db_spark.operators.clustering import kmeans_fit
    from openstack_billing_from_db_spark.operators.quantization import (
        _base,
        ivf_pq_topk,
        pq_train,
    )
    from openstack_billing_from_db_spark.operators.caching import tracked_persist

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(
        emb,
        dims=_PQ_DIMS,
        n_subspaces=_PQ_M,
        k=_PQ_K,
        n_iter=_PQ_ITER,
        round_dp=_PQ_DP,
    )
    base = tracked_persist(_base(emb, "vec_id", "embedding"))
    coarse = kmeans_fit(base, k=_IVFPQ_CELLS, n_iter=1, round_dp=_PQ_DP)
    return ivf_pq_topk(
        emb,
        books,
        coarse,
        n_probe=_IVFPQ_PROBE,
        n_queries=_ADC_NQ,
        topk=_ADC_TOPK,
    )


def _ivf_pq_residual_oracle() -> str:
    """Residual IVF-PQ replay: coarse cells over raw vectors, PQ
    training/encoding over RESIDUALS (vector − cell centroid), queries
    scored via their residual from each PROBED cell."""
    sd = _PQ_DIMS // _PQ_M
    blocks = [
        "corpus AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS e FROM embeddings)",
        _coarse_blocks(),
        f"""rescorpus AS (
  SELECT co.vid, g.cell,
         list_transform(range(1, {_PQ_DIMS + 1}), i -> co.e[i] - ce.c[i]) AS e
  FROM corpus co JOIN gcell g USING (vid) JOIN gc1 ce ON ce.cid = g.cell
)""",
    ] + _pq_train_blocks("rescorpus")
    nb_joins = "\n  ".join(
        f"JOIN code_{m} v{m} USING (vid) JOIN c{_PQ_ITER}_{m} b{m} ON b{m}.cid = v{m}.c{m}"
        for m in range(_PQ_M)
    )
    nb_cols = ", ".join(f"b{m}.c AS cc{m}" for m in range(_PQ_M))
    # query residual w.r.t. the probed cell pc: (q.e[i] − pc.c[i])
    dist = " + ".join(
        f"list_sum(list_transform(range(1, {sd + 1}), "
        f"i -> (q.e[{m * sd}+i] - pc.c[{m * sd}+i] - n.cc{m}[i])"
        f" * (q.e[{m * sd}+i] - pc.c[{m * sd}+i] - n.cc{m}[i])))"
        for m in range(_PQ_M)
    )
    ctes = ",\n".join(blocks)
    return f"""
WITH {ctes},
nb AS (
  SELECT rc.vid, rc.cell, {nb_cols}
  FROM rescorpus rc
  {nb_joins}
),
q AS (SELECT vid AS query_id, e FROM corpus ORDER BY vid LIMIT {_ADC_NQ}),
probe AS (
  SELECT query_id, cid AS cell FROM (
    SELECT q.query_id, ce.cid, row_number() OVER (
      PARTITION BY q.query_id
      ORDER BY list_inner_product(ce.c, ce.c) - 2 * list_inner_product(q.e, ce.c), ce.cid
    ) AS rn
    FROM q CROSS JOIN gc1 ce
  ) WHERE rn <= {_IVFPQ_PROBE}
),
scored AS (
  SELECT q.query_id, n.vid AS neighbor_id,
         {dist} AS adist
  FROM q JOIN probe p USING (query_id)
  JOIN gc1 pc ON pc.cid = p.cell
  JOIN nb n ON n.cell = p.cell AND n.vid != q.query_id
)
SELECT query_id, neighbor_id, rn FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY adist, neighbor_id) AS BIGINT) AS rn
  FROM scored
) WHERE rn <= {_ADC_TOPK}"""


@register("q113_ivf_pq_residual_topk", oracle=_ivf_pq_residual_oracle())
def q113_ivf_pq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ top-{_ADC_TOPK}
    (operators/quantization.ivf_pq_residual_topk) — the FAISS-style
    refinement of q112: PQ codebooks are trained on each vector's
    residual from its cell centroid (residuals concentrate around the
    origin, so one shared codebook set quantizes every cell's
    displacement field far more accurately than raw coordinates), and a
    query probing cell c is scored via its own residual from c. The
    oracle replays coarse training, residualization, residual-PQ
    training, probing, and scoring in one chain."""
    from openstack_billing_from_db_spark.operators.caching import tracked_persist
    from openstack_billing_from_db_spark.operators.clustering import kmeans_fit
    from openstack_billing_from_db_spark.operators.quantization import (
        _base,
        ivf_pq_residual_topk,
        pq_train,
        residualize,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = tracked_persist(_base(emb, "vec_id", "embedding"))
    coarse = kmeans_fit(base, k=_IVFPQ_CELLS, n_iter=1, round_dp=_PQ_DP)
    rbase = residualize(base, coarse)
    books = pq_train(
        rbase.select("vid", "e"),
        id_col="vid",
        vec_col="e",
        dims=_PQ_DIMS,
        n_subspaces=_PQ_M,
        k=_PQ_K,
        n_iter=_PQ_ITER,
        round_dp=_PQ_DP,
    )
    return ivf_pq_residual_topk(
        emb,
        books,
        coarse,
        n_probe=_IVFPQ_PROBE,
        n_queries=_ADC_NQ,
        topk=_ADC_TOPK,
    )


# --- ANN quality evaluation: PQ recall vs exact ------------------------------


def _pq_recall_oracle() -> str:
    """The q111 ADC chain plus an exact-L2 ranking over raw vectors,
    joined per query: recall@{_ADC_TOPK} in basis points. Both rankings
    use the identical (x−y)² fold and (dist, neighbor_id) tie order."""
    sd = _PQ_DIMS // _PQ_M
    blocks = [
        "corpus AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS e FROM embeddings)"
    ] + _pq_train_blocks("corpus")
    nb_joins = "\n  ".join(
        f"JOIN code_{m} v{m} USING (vid) JOIN c{_PQ_ITER}_{m} b{m} ON b{m}.cid = v{m}.c{m}"
        for m in range(_PQ_M)
    )
    nb_cols = ", ".join(f"b{m}.c AS cc{m}" for m in range(_PQ_M))
    adist = " + ".join(
        f"list_sum(list_transform(range(1, {sd + 1}), "
        f"i -> (q.e[{m * sd}+i] - n.cc{m}[i]) * (q.e[{m * sd}+i] - n.cc{m}[i])))"
        for m in range(_PQ_M)
    )
    edist = (
        f"list_sum(list_transform(range(1, {_PQ_DIMS + 1}), "
        f"i -> (q.e[i] - c.e[i]) * (q.e[i] - c.e[i])))"
    )
    ctes = ",\n".join(blocks)
    return f"""
WITH {ctes},
nb AS (
  SELECT co.vid, {nb_cols}
  FROM corpus co
  {nb_joins}
),
q AS (SELECT vid AS query_id, e FROM corpus ORDER BY vid LIMIT {_ADC_NQ}),
adc AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, n.vid AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {adist}, n.vid) AS rn
    FROM q CROSS JOIN nb n WHERE n.vid != q.query_id
  ) WHERE rn <= {_ADC_TOPK}
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vid AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {edist}, c.vid) AS rn
    FROM q CROSS JOIN corpus c WHERE c.vid != q.query_id
  ) WHERE rn <= {_ADC_TOPK}
)
SELECT e.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS recall_bp
FROM exact e LEFT JOIN adc a USING (query_id, neighbor_id)
GROUP BY e.query_id
"""


@register("q114_pq_recall", oracle=_pq_recall_oracle())
def q114_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{_ADC_TOPK} of the PQ asymmetric-distance ranking against
    the exact L2 ranking, per query, in basis points — the evaluation
    loop every production ANN deployment runs before trusting a
    compression config (codebook count / bits trade recall for scan
    width; this query is how you measure where you landed). Both
    rankings share tie order (dist, neighbor_id); the exact side is the
    verification luxury computed on the small query set only."""
    from pyspark.sql import Window

    from openstack_billing_from_db_spark.operators.quantization import (
        _base,
        pq_adc_topk,
        pq_train,
    )
    from openstack_billing_from_db_spark.operators.caching import tracked_persist

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(
        emb,
        dims=_PQ_DIMS,
        n_subspaces=_PQ_M,
        k=_PQ_K,
        n_iter=_PQ_ITER,
        round_dp=_PQ_DP,
    )
    adc = pq_adc_topk(emb, books, n_queries=_ADC_NQ, topk=_ADC_TOPK).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    base = tracked_persist(_base(emb, "vec_id", "embedding"))
    queries = base.orderBy("vid").limit(_ADC_NQ).select(
        F.col("vid").alias("query_id"), F.col("e").alias("qe")
    )
    dist = F.aggregate(
        F.zip_with(F.col("qe"), F.col("e"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    exact = (
        base.withColumnRenamed("vid", "neighbor_id")
        .crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dist", dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _ADC_TOPK)
        .select("query_id", "neighbor_id")
    )
    return exact.join(adc, ["query_id", "neighbor_id"], "left").groupBy(
        "query_id"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
        F.expr(
            "CAST(sum(coalesce(hit, 0)) * 10000 div count(1) AS BIGINT)"
        ).alias("recall_bp"),
    )


# --- IVF-PQ with exact re-rank (round 6) -------------------------------------

_RERANK_R = 4  # ADC candidate factor: re-rank top-(topk·R) exactly


def _ivf_pq_rerank_oracle() -> str:
    """The q112 chain (coarse + PQ train + probe + ADC scoring), its
    final top-k widened to top-(k·R) candidates, then an exact-L2
    re-rank of that bounded set against raw vectors — the same (x−y)²
    fold and (dist, neighbor_id) tie order as q114's exact side."""
    full = _ivf_pq_oracle()
    ctes = full.rsplit("\nSELECT query_id, neighbor_id, rn FROM (", 1)[0]
    edist = (
        f"list_sum(list_transform(range(1, {_PQ_DIMS + 1}), "
        f"i -> (q.e[i] - co.e[i]) * (q.e[i] - co.e[i])))"
    )
    return f"""{ctes},
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adist, neighbor_id) AS rn
    FROM scored
  ) WHERE rn <= {_ADC_TOPK * _RERANK_R}
)
SELECT query_id, neighbor_id, rn FROM (
  SELECT c.query_id, c.neighbor_id,
         CAST(row_number() OVER (PARTITION BY c.query_id
                                 ORDER BY {edist}, c.neighbor_id) AS BIGINT) AS rn
  FROM cand c
  JOIN q ON q.query_id = c.query_id
  JOIN corpus co ON co.vid = c.neighbor_id
) WHERE rn <= {_ADC_TOPK}"""


@register("q129_ivf_pq_rerank", oracle=_ivf_pq_rerank_oracle())
def q129_ivf_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + exact re-rank top-{_ADC_TOPK}
    (operators/quantization.ivf_pq_rerank_topk) — the standard last
    mile the ANN family documents: q112's compressed probe-and-scan
    yields top-{_ADC_TOPK * _RERANK_R} ADC candidates, and only that
    bounded set (n_queries · k · R rows, independent of corpus size) is
    re-scored against uncompressed vectors via a broadcast-hash fetch —
    recovering the recall PQ loses without ever shuffling raw
    embeddings. tests/test_scale_ops.py pins recall@{_ADC_TOPK} ≥
    q112's. The oracle replays coarse training, PQ training, probing,
    ADC candidate ranking, and the exact re-rank in one CTE chain."""
    from openstack_billing_from_db_spark.operators.caching import tracked_persist
    from openstack_billing_from_db_spark.operators.clustering import kmeans_fit
    from openstack_billing_from_db_spark.operators.quantization import (
        _base,
        ivf_pq_rerank_topk,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(
        emb,
        dims=_PQ_DIMS,
        n_subspaces=_PQ_M,
        k=_PQ_K,
        n_iter=_PQ_ITER,
        round_dp=_PQ_DP,
    )
    base = tracked_persist(_base(emb, "vec_id", "embedding"))
    coarse = kmeans_fit(base, k=_IVFPQ_CELLS, n_iter=1, round_dp=_PQ_DP)
    return ivf_pq_rerank_topk(
        emb,
        books,
        coarse,
        n_probe=_IVFPQ_PROBE,
        n_queries=_ADC_NQ,
        topk=_ADC_TOPK,
        rerank=_RERANK_R,
    )


# --- int8 scalar quantization profile ----------------------------------------

_SQ_LEVELS = 255


@register(
    "q115_sq8_profile",
    oracle=f"""
WITH corpus AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS e FROM embeddings),
flat AS (
  SELECT vid, generate_subscripts(e, 1) AS dim, unnest(e) AS v FROM corpus
),
rng AS (
  SELECT dim, min(v) AS vmin, max(v) AS vmax FROM flat GROUP BY dim
),
coded AS (
  SELECT f.dim, f.v, r.vmin, r.vmax,
         CASE WHEN r.vmax = r.vmin THEN 0
              ELSE CAST(floor((f.v - r.vmin) * {_SQ_LEVELS} / (r.vmax - r.vmin) + 0.5) AS BIGINT)
         END AS code
  FROM flat f JOIN rng r USING (dim)
),
err AS (
  SELECT dim, vmin, vmax, code,
         abs(v - (vmin + code * (vmax - vmin) / {_SQ_LEVELS}))
           * {_SQ_LEVELS} / (CASE WHEN vmax = vmin THEN 1 ELSE vmax - vmin END)
           AS err_lvl
  FROM coded
)
SELECT dim, CAST(count(*) AS BIGINT) AS n_values,
       CAST(count(DISTINCT code) AS BIGINT) AS n_codes_used,
       CAST(sum(CASE WHEN err_lvl > 0.5000001 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over_half_level,
       CAST(sum(CAST(err_lvl AS DECIMAL(18,9))) AS DOUBLE) AS err_levels_sum
FROM err
GROUP BY dim
""",
)
def q115_sq8_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization profile — the cheap sibling of PQ: each
    dimension is independently mapped onto {_SQ_LEVELS}+1 levels between
    its corpus min and max (8 bits/dim = an 8× payload cut with no
    training step). Output per dimension: codes actually used,
    round-trip error in level units (sum, and the count exceeding half
    a level — which must be ZERO: round-to-nearest is within half a
    level by construction, and the oracle pins that invariant with an
    epsilon for the shared fp rounding). Shape at scale: one
    partial-aggregated min/max pass (64 rows out), then a map-side
    encode + per-dim partial-aggregated profile — the corpus shuffles
    never; both passes carry (dim, value) narrow rows."""
    emb = ensure_map_parallelism(load_table(spark, sf_dir, "embeddings"))
    flat = emb.select(
        F.col("vec_id").alias("vid"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "v"),
    ).select("vid", (F.col("dim0") + 1).alias("dim"), "v")
    rng = flat.groupBy("dim").agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax")
    )
    L = _SQ_LEVELS
    coded = flat.join(rng, "dim").withColumn(
        "code",
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0).cast("long")).otherwise(
            F.expr(f"CAST(floor((v - vmin) * {L} / (vmax - vmin) + 0.5) AS BIGINT)")
        ),
    )
    err = coded.withColumn(
        "err_lvl",
        F.expr(
            f"abs(v - (vmin + code * (vmax - vmin) / {L})) * {L}"
            f" / (CASE WHEN vmax = vmin THEN 1 ELSE vmax - vmin END)"
        ),
    )
    return err.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.count_distinct("code").cast("long").alias("n_codes_used"),
        F.sum(F.when(F.col("err_lvl") > 0.5000001, 1).otherwise(0))
        .cast("long")
        .alias("n_over_half_level"),
        F.sum(F.col("err_lvl").cast("decimal(18,9)")).cast("double").alias(
            "err_levels_sum"
        ),
    )


# --- LSH dedup recall/precision evaluation -----------------------------------

_LSH_EVAL_T = 0.5  # true-pair Jaccard threshold
# The exact ground-truth side is pair-quadratic per shared shingle, so
# the registered query BOUNDS it (VERDICT r4 Next #2): evaluate inside a
# deterministic hash-sample of documents, and drop shingles whose
# document frequency exceeds a cap before the self-join — the standard
# df-cap: boilerplate shingles contribute df² pair blowup but almost no
# Jaccard signal. Candidates are restricted to the same sampled universe
# so recall/precision stay well-defined.
_LSH_EVAL_KEEP_BP = 8000  # keep 80% of docs (basis points of 10000)
_LSH_EVAL_DF_CAP = 64  # max document frequency of a ground-truth shingle

_LSH_SAMPLE_SEED = "q116sample"


def _lsh_recall_oracle() -> str:
    from openstack_billing_from_db_spark.functions.hashing import (
        seeded_hash64_sql,
    )
    from openstack_billing_from_db_spark.plans.pipeline_queries import (
        _MINHASH_JACCARD_CTES,
    )

    t = _LSH_EVAL_T
    gate = seeded_hash64_sql("CAST(doc_id AS VARCHAR)", _LSH_SAMPLE_SEED)
    return f"""
WITH {_MINHASH_JACCARD_CTES},
de AS (SELECT doc_id FROM documents WHERE {gate} % 10000 < {_LSH_EVAL_KEEP_BP}),
pse AS (SELECT ps.* FROM ps JOIN de USING (doc_id)),
dfok AS (SELECT shingle FROM pse GROUP BY shingle HAVING count(*) <= {_LSH_EVAL_DF_CAP}),
psc AS (SELECT pse.* FROM pse JOIN dfok USING (shingle)),
sze AS (SELECT doc_id, count(*) AS n FROM psc GROUP BY doc_id),
tp AS (
  SELECT pa.doc_id AS doc_a, pb.doc_id AS doc_b, count(*) AS i
  FROM psc pa JOIN psc pb ON pb.shingle = pa.shingle AND pa.doc_id < pb.doc_id
  GROUP BY pa.doc_id, pb.doc_id
),
tr AS (
  SELECT t.doc_a, t.doc_b
  FROM tp t JOIN sze sa ON sa.doc_id = t.doc_a JOIN sze sb ON sb.doc_id = t.doc_b
  WHERE CAST(t.i AS DOUBLE) / (sa.n + sb.n - t.i) >= {t}
),
ce AS (
  SELECT jc.doc_a, jc.doc_b FROM jc
  JOIN de da ON da.doc_id = jc.doc_a
  JOIN de db ON db.doc_id = jc.doc_b
),
m AS (
  SELECT
    (SELECT count(*) FROM tr) AS n_true,
    (SELECT count(*) FROM ce) AS n_cand,
    (SELECT count(*) FROM tr JOIN ce c ON c.doc_a = tr.doc_a AND c.doc_b = tr.doc_b) AS n_caught
)
SELECT CAST(n_true AS BIGINT) AS n_true,
       CAST(n_cand AS BIGINT) AS n_cand,
       CAST(n_caught AS BIGINT) AS n_caught,
       CAST(CASE WHEN n_true = 0 THEN 10000
            ELSE n_caught * 10000 // n_true END AS BIGINT) AS recall_bp,
       CAST(CASE WHEN n_cand = 0 THEN 10000
            ELSE n_caught * 10000 // n_cand END AS BIGINT) AS candidate_precision_bp
FROM m
"""


@register("q116_lsh_recall", oracle=_lsh_recall_oracle())
def q116_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision of the MinHash-LSH candidate stage against
    EXACT Jaccard >= _LSH_EVAL_T ground truth — the q114-style
    evaluation loop for the dedup family: recall tells you whether the
    banding (sized by operators/dedup.tune_banding) catches the true
    near-dups, precision tells you how much exact-verify work the
    candidates cost. The ground-truth side is BOUNDED by design: a
    deterministic _LSH_EVAL_KEEP_BP/10000 hash-sample of documents and
    a shingle document-frequency cap (_LSH_EVAL_DF_CAP) before the
    pair-quadratic shingle self-join; Jaccard is computed over the
    capped shingle sets, candidates are restricted to the sampled
    universe, and BOTH metrics read the same capped ground truth
    (precision = caught/candidates), so the pair stays internally
    consistent at any corpus size.
    Output: one row (n_true, n_cand, n_caught, recall_bp,
    candidate_precision_bp)."""
    from openstack_billing_from_db_spark.functions.hashing import seeded_hash64
    from openstack_billing_from_db_spark.operators import dedup, text
    from openstack_billing_from_db_spark.operators.caching import tracked_persist
    from openstack_billing_from_db_spark.plans.pipeline_queries import (
        _NUM_HASHES,
        _ROWS_PER_BAND,
        _SHINGLE_N,
    )

    def _kept(col):
        return seeded_hash64(col.cast("string"), _LSH_SAMPLE_SEED) % 10000 < (
            _LSH_EVAL_KEEP_BP
        )

    docs = load_table(spark, sf_dir, "documents")
    cand = tracked_persist(
        dedup.minhash_near_duplicates(
            docs,
            num_hashes=_NUM_HASHES,
            rows_per_band=_ROWS_PER_BAND,
            shingle_n=_SHINGLE_N,
        )
        .select("doc_a", "doc_b", "jaccard")
        .filter(_kept(F.col("doc_a")) & _kept(F.col("doc_b")))
    )
    ps = tracked_persist(
        ensure_map_parallelism(
            docs.filter(_kept(F.col("doc_id"))).select("doc_id", "text")
        )
        .select(
            "doc_id",
            F.explode(
                text.word_shingles(text.words(F.col("text")), _SHINGLE_N)
            ).alias("shingle"),
        )
        .distinct()
    )
    # df-cap: a shingle shared by > cap docs contributes up to df² pairs
    # to the self-join below; drop it from the ground-truth sets
    df_ok = (
        ps.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _LSH_EVAL_DF_CAP)
        .select("shingle")
    )
    psc = tracked_persist(ps.join(df_ok, "shingle", "left_semi"))
    sz = psc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        psc.alias("a")
        .join(
            psc.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    true_pairs = tracked_persist(
        inter.join(sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .filter(
            F.col("i").cast("double")
            / (F.col("na") + F.col("nb") - F.col("i"))
            >= _LSH_EVAL_T
        )
        .select("doc_a", "doc_b")
    )
    # The pair-quadratic ground-truth chain above feeds BOTH the n_true
    # and the caught branch; those are separate subtrees of the final
    # 1-row crossJoin plan and execute CONCURRENTLY, and concurrent
    # first readers of a lazy persist do not wait for each other's fill
    # (the q123/q146 pattern, guide §1/§5) — so the self-join ran twice.
    # One blocking count fills the cache exactly once; the count result
    # itself is discarded (n_true still computes in-plan so the result
    # shape/semantics are untouched).
    true_pairs.count()
    caught = true_pairs.join(cand.select("doc_a", "doc_b"), ["doc_a", "doc_b"])
    n_true = true_pairs.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    n_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_cand"))
    n_caught = caught.agg(F.count(F.lit(1)).cast("long").alias("n_caught"))
    return (
        n_true.crossJoin(n_cand).crossJoin(n_caught)
        .select(
            "n_true",
            "n_cand",
            "n_caught",
            F.expr("CAST(CASE WHEN n_true = 0 THEN 10000 "
                   "ELSE n_caught * 10000 div n_true END AS BIGINT)").alias(
                "recall_bp"
            ),
            F.expr("CAST(CASE WHEN n_cand = 0 THEN 10000 "
                   "ELSE n_caught * 10000 div n_cand END AS BIGINT)").alias(
                "candidate_precision_bp"
            ),
        )
    )


# --- PQ-backed semantic dedup (round 10) --------------------------------------

_SDPQ_SLACK = 0.05


def _semantic_dedup_pq_oracle() -> str:
    """Full replay of similarity.semantic_dedup_pq: the q73 Lloyd
    cluster chain + the q110 per-subspace PQ training/encode blocks,
    then the candidate gate on RECONSTRUCTED vectors — dot_hat =
    Σ_m lip(r_m^a, r_m^b) and n2_hat = Σ_m lip(r_m, r_m) over the coded
    centroids, compared in squared form at (t − slack)² — and the exact
    squared-form verify on surviving candidates only (byte-for-byte
    q130's predicate). The Spark side accumulates the same per-dim /
    per-subspace left-to-right folds (no BLAS, no pairwise summation),
    so the candidate boundary itself is cross-engine exact."""
    from openstack_billing_from_db_spark.plans.pipeline_queries import (
        _SEM_T,
        _kmeans_oracle,
    )

    km = _kmeans_oracle()
    kmeans_ctes = km.split("WITH ", 1)[1].rsplit(
        "\nSELECT vid AS vec_id", 1
    )[0]
    pq_ctes = ",\n".join(_pq_train_blocks("corpus"))
    fcb = f"c{_PQ_ITER}"
    rec_joins = "\n".join(
        f"  JOIN code_{m} USING (vid)\n"
        f"  JOIN {fcb}_{m} cb{m} ON cb{m}.cid = code_{m}.c{m}"
        for m in range(_PQ_M)
    )
    rcols = ", ".join(f"cb{m}.c AS r{m}" for m in range(_PQ_M))
    xr = ", ".join(f"r.r{m}" for m in range(_PQ_M))
    dot_hat = " + ".join(
        f"list_inner_product(a.r{m}, b.r{m})" for m in range(_PQ_M)
    )
    n2hat = " + ".join(
        f"list_inner_product(r.r{m}, r.r{m})" for m in range(_PQ_M)
    )
    t2 = _SEM_T * _SEM_T
    ts = _SEM_T - _SDPQ_SLACK
    ts2 = ts * ts
    return f"""
WITH {kmeans_ctes},
{pq_ctes},
rec AS MATERIALIZED (
  SELECT co.vid, {rcols}
  FROM corpus co
{rec_joins}
),
x AS MATERIALIZED (
  SELECT f.vid, f.cluster, co.e,
         list_inner_product(co.e, co.e) AS n2,
         {xr}, ({n2hat}) AS n2hat
  FROM afinal f JOIN corpus co USING (vid) JOIN rec r ON r.vid = f.vid
),
pr AS (
  SELECT a.vid AS va, b.vid AS vb, a.n2 AS n2a, b.n2 AS n2b,
         list_inner_product(a.e, b.e) AS dot,
         ({dot_hat}) AS dot_hat,
         a.n2hat AS nha, b.n2hat AS nhb
  FROM x a JOIN x b ON a.cluster = b.cluster AND a.vid < b.vid
),
cand AS (
  SELECT * FROM pr
  WHERE dot_hat >= 0 AND dot_hat * dot_hat >= {ts2!r} * nha * nhb
),
drp AS (
  SELECT DISTINCT vb AS vid FROM cand
  WHERE dot >= 0 AND dot * dot >= {t2!r} * n2a * n2b
)
SELECT x.vid AS vec_id, CAST(x.cluster AS BIGINT) AS cluster_id,
       CASE WHEN d.vid IS NULL THEN 'kept' ELSE 'dropped' END AS fate
FROM x LEFT JOIN drp d ON d.vid = x.vid
"""


@register("q147_semantic_dedup_pq", oracle=_semantic_dedup_pq_oracle())
def q147_semantic_dedup_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-backed SemDeDup (similarity.semantic_dedup_pq, VERDICT r9
    Next #7): q130's clustering and canonical-survivor semantics, but
    the cluster-keyed pair stage carries {_PQ_M} PQ codes per vector
    instead of the raw 64-double array — the memory lever for the
    >10⁸-vector regime, where raw floats through the Σ n_c² pair
    shuffle stop being feasible. Pair cosine is approximated from
    broadcast code-to-code dot tables (reconstruction identities exact
    across disjoint subspaces; every accumulation the same
    left-to-right fold the oracle replays), candidates clearing
    threshold − {_SDPQ_SLACK} in squared form re-join the raw vectors
    for q130's exact verify — so drops are provably a subset of the
    exact path's. The oracle replays clustering, PQ training, encode,
    reconstruction, candidate gate, and verify in one DuckDB query."""
    from openstack_billing_from_db_spark.operators.similarity import (
        semantic_dedup_pq,
    )
    from openstack_billing_from_db_spark.plans.pipeline_queries import (
        _KM_DP,
        _KM_ITER,
        _KM_K,
        _SEM_T,
    )

    return semantic_dedup_pq(
        load_table(spark, sf_dir, "embeddings"),
        dims=_PQ_DIMS,
        k=_KM_K,
        n_iter=_KM_ITER,
        round_dp=_KM_DP,
        threshold=_SEM_T,
        pq_subspaces=_PQ_M,
        pq_k=_PQ_K,
        pq_iter=_PQ_ITER,
        pq_dp=_PQ_DP,
        candidate_slack=_SDPQ_SLACK,
    )


# --- PQ SemDeDup at the production k ∝ n shape (round 11) ----------------------
#
# q147 certifies the PQ pair stage at q130's fixed k=8 (oracle-parity
# config — its Σ n_c² pair work grows quadratically by design); q140
# certifies the k ∝ n clustering WITHOUT PQ. This entry certifies their
# COMPOSITION — the configuration a 10⁸-vector user actually runs
# (VERDICT r10 Next #3): target_cluster_size-derived k over the
# 5×-replicated corpus (2500 vectors → 1250 clusters at target 2, the
# q140 fixture), bounded cluster pair blocks, PQ codes through the pair
# stage, exact verify on survivors. k = 1250 also exceeds
# clustering.hierarchical_assign_threshold(), so the driver row
# additionally certifies the round-11 cost-derived two-level assignment
# kernel end-to-end.


def _semantic_dedup_pq_scaled_oracle() -> str:
    """q140's replicated derived-k Lloyd CTE chain (reused verbatim by
    string split, the q147-on-_kmeans_oracle pattern) + q147's PQ
    train/encode/reconstruct blocks retargeted at the replicated
    ``corpus`` + the identical candidate gate and exact verify."""
    from openstack_billing_from_db_spark.plans.pipeline_queries import (
        _SEM_T,
        _semantic_dedup_scaled_oracle,
    )

    sc = _semantic_dedup_scaled_oracle()
    kmeans_ctes = sc.split("WITH ", 1)[1].split(",\nx AS MATERIALIZED (", 1)[0]
    pq_ctes = ",\n".join(_pq_train_blocks("corpus"))
    fcb = f"c{_PQ_ITER}"
    rec_joins = "\n".join(
        f"  JOIN code_{m} USING (vid)\n"
        f"  JOIN {fcb}_{m} cb{m} ON cb{m}.cid = code_{m}.c{m}"
        for m in range(_PQ_M)
    )
    rcols = ", ".join(f"cb{m}.c AS r{m}" for m in range(_PQ_M))
    xr = ", ".join(f"r.r{m}" for m in range(_PQ_M))
    dot_hat = " + ".join(
        f"list_inner_product(a.r{m}, b.r{m})" for m in range(_PQ_M)
    )
    n2hat = " + ".join(
        f"list_inner_product(r.r{m}, r.r{m})" for m in range(_PQ_M)
    )
    t2 = _SEM_T * _SEM_T
    ts = _SEM_T - _SDPQ_SLACK
    ts2 = ts * ts
    return f"""
WITH {kmeans_ctes},
{pq_ctes},
rec AS MATERIALIZED (
  SELECT co.vid, {rcols}
  FROM corpus co
{rec_joins}
),
x AS MATERIALIZED (
  SELECT f.vid, f.cluster, co.e,
         list_inner_product(co.e, co.e) AS n2,
         {xr}, ({n2hat}) AS n2hat
  FROM afinal f JOIN corpus co USING (vid) JOIN rec r ON r.vid = f.vid
),
pr AS (
  SELECT a.vid AS va, b.vid AS vb, a.n2 AS n2a, b.n2 AS n2b,
         list_inner_product(a.e, b.e) AS dot,
         ({dot_hat}) AS dot_hat,
         a.n2hat AS nha, b.n2hat AS nhb
  FROM x a JOIN x b ON a.cluster = b.cluster AND a.vid < b.vid
),
cand AS (
  SELECT * FROM pr
  WHERE dot_hat >= 0 AND dot_hat * dot_hat >= {ts2!r} * nha * nhb
),
drp AS (
  SELECT DISTINCT vb AS vid FROM cand
  WHERE dot >= 0 AND dot * dot >= {t2!r} * n2a * n2b
)
SELECT x.vid AS vec_id, CAST(x.cluster AS BIGINT) AS cluster_id,
       CASE WHEN d.vid IS NULL THEN 'kept' ELSE 'dropped' END AS fate
FROM x LEFT JOIN drp d ON d.vid = x.vid
"""


@register(
    "q152_semantic_dedup_pq_scaled",
    oracle=_semantic_dedup_pq_scaled_oracle(),
)
def q152_semantic_dedup_pq_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-backed SemDeDup at the PRODUCTION configuration
    (similarity.semantic_dedup_pq with ``target_cluster_size`` — q140's
    k ∝ n clustering composed with q147's PQ pair stage): k =
    ceil(n/2) = 1250 derived centroids over the 5×-replicated corpus,
    so per-cluster pair blocks stay bounded as the corpus grows while
    the pair shuffle carries {_PQ_M} int codes instead of 64 doubles.
    The derived k drives the round-11 cost-based hierarchical
    assignment kernel (clustering._assign two-level path, pinned ≡
    flat); exact replicas are the expected drops (their PQ codes are
    identical → approximate cosine exactly 1 → exact verify at cosine
    1). The oracle replays replication, derived-k Lloyd, PQ training,
    encode, reconstruction, candidate gate, and verify."""
    from openstack_billing_from_db_spark.operators.similarity import (
        semantic_dedup_pq,
    )
    from openstack_billing_from_db_spark.plans.pipeline_queries import (
        _KM_DP,
        _SEM_SCALE_ITER,
        _SEM_SCALE_R,
        _SEM_SCALE_TARGET,
        _SEM_T,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rep = emb.select(
        F.explode(
            F.array(*[F.lit(i).cast("long") for i in range(_SEM_SCALE_R)])
        ).alias("r"),
        "vec_id",
        "embedding",
    ).select(
        (F.col("r") * 1000000 + F.col("vec_id")).alias("vec_id"),
        "embedding",
    )
    return semantic_dedup_pq(
        rep,
        dims=_PQ_DIMS,
        n_iter=_SEM_SCALE_ITER,
        round_dp=_KM_DP,
        threshold=_SEM_T,
        target_cluster_size=_SEM_SCALE_TARGET,
        pq_subspaces=_PQ_M,
        pq_k=_PQ_K,
        pq_iter=_PQ_ITER,
        pq_dp=_PQ_DP,
        candidate_slack=_SDPQ_SLACK,
    )
