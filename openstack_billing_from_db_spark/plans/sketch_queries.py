"""Sketch/sampling/tokenizer/divergence registry entries: KMV and
HyperLogLog distinct-count sketching, weighted priority sampling, corpus
BPE encoding, per-source KL / pairwise Jensen-Shannon divergence, token
entropy, and the count-min error evaluation.

Each is a (Spark plan, DuckDB oracle) pair with engine-exact integer
arithmetic (registry.py header). The reference
(CCI-MOC/openstack-billing-from-db) has none of these — beyond-reference
components in the SURVEY.md §2 sense, rounding out the sketch/sampling
corner of the training-data-pipeline surface (the dedup sketches in
operators/dedup.py are their siblings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.functions.hashing import seeded_hash64_sql
from openstack_billing_from_db_spark.operators.curation import WORDS_SQL as _W
from openstack_billing_from_db_spark.operators.parallelism import (
    ensure_map_parallelism,
)
from openstack_billing_from_db_spark.operators.sketch import (
    hll_distinct,
    hll_distinct_sql,
    kmv_distinct,
    kmv_distinct_sql,
)
from openstack_billing_from_db_spark.plans.pipeline_queries import (
    _BPE_MERGES,
    _bpe_cte_blocks,
)
from openstack_billing_from_db_spark.registry import register
from openstack_billing_from_db_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every consumer of this projection is a tokenize/hash stream whose
    # map cost is proportional to text bytes — the rebalance is gated on
    # the same size floor as the text operators' inner guards (a sub-
    # 32 MB source tokenizes faster on the scan's own cores than an
    # exchange + full task wave costs; at corpus scale the guard engages
    # exactly as before)
    from openstack_billing_from_db_spark.operators.text import (
        _TOKENIZE_REBALANCE_MIN_BYTES,
    )

    return ensure_map_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "text", "source"),
        skip_below_bytes=_TOKENIZE_REBALANCE_MIN_BYTES,
    )


# --- KMV distinct-count sketch ----------------------------------------------

_KMV_K = 16


@register(
    "q98_kmv_distinct",
    oracle=f"""
WITH wrd AS (SELECT source, {_W} AS w FROM documents),
d AS (SELECT DISTINCT source, unnest(w) AS v FROM wrd)
{kmv_distinct_sql(from_distinct_cte="d", group_col="source", k=_KMV_K)}
""",
)
def q98_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-term cardinality via the KMV sketch
    (operators/sketch.py, k={_KMV_K}), exact count alongside for
    accuracy inspection. Shape at scale: the corpus reduces to the
    partial-aggregated DISTINCT (source, term) stream (vocabulary-sized)
    before the k-minimum window — the sketch path for cardinalities
    where ``approx_count_distinct`` (HLL++, JVM-internal hashing) can't
    be oracle-replayed."""
    from openstack_billing_from_db_spark.operators import text

    docs = _docs(spark, sf_dir)
    toks = docs.select("source", F.explode(text.words(F.col("text"))).alias("v"))
    return kmv_distinct(toks, group_col="source", value_col="v", k=_KMV_K)


# --- weighted priority sampling ----------------------------------------------

_PRI_K = 20


@register(
    "q99_priority_sample",
    oracle=f"""
WITH w AS (
  SELECT o_orderkey AS key,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS weight
  FROM orders
),
p AS (
  SELECT key, weight,
         {seeded_hash64_sql("CAST(key AS VARCHAR)", "pri")} // weight AS priority
  FROM w
),
top AS (SELECT key, weight, priority FROM p ORDER BY priority, key LIMIT {_PRI_K})
SELECT key AS o_orderkey, weight AS weight_cents, priority,
       CAST(row_number() OVER (ORDER BY priority, key) AS BIGINT) AS rnk
FROM top
""",
)
def q99_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_PRI_K} weighted priority sample of orders by price
    (operators/sampling.priority_sample): reproducible weighted sampling
    without replacement, heavy orders near-certain members. Plan:
    map-side hash/weight projection → TakeOrderedAndProject (per-
    partition k-heaps, no shuffle of the input) → rank over the k
    collected rows."""
    from openstack_billing_from_db_spark.operators.sampling import priority_sample

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "weight"
        ),
    )
    top = priority_sample(orders, key_col="o_orderkey", weight_col="weight", k=_PRI_K)
    return top.select(
        F.col("key").alias("o_orderkey"),
        F.col("weight").alias("weight_cents"),
        "priority",
        "rnk",
    )


# --- KMV set algebra: pairwise overlap ---------------------------------------


def _kmv_overlap_oracle() -> str:
    from openstack_billing_from_db_spark.operators.sketch import (
        KMV_M,
        kmv_hash_sql,
    )

    k = _KMV_K
    return f"""
WITH wrd AS (SELECT source, {_W} AS w FROM documents),
d AS (SELECT DISTINCT source, unnest(w) AS v FROM wrd),
hh AS (SELECT source, v, {kmv_hash_sql("CAST(v AS VARCHAR)")} AS h FROM d),
sk AS (SELECT source, v, h FROM (
  SELECT source, v, h,
         row_number() OVER (PARTITION BY source ORDER BY h, v) AS rn FROM hh)
  WHERE rn <= {k}),
srcs AS (SELECT DISTINCT source FROM sk),
pairs AS (SELECT a.source AS grp_a, b.source AS grp_b
          FROM srcs a JOIN srcs b ON a.source < b.source),
pr AS (
  SELECT p.grp_a, p.grp_b, s.v, min(s.h) AS h,
         max(CASE WHEN s.source = p.grp_a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.source = p.grp_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sk s ON s.source IN (p.grp_a, p.grp_b)
  GROUP BY p.grp_a, p.grp_b, s.v
),
rk AS (SELECT *, row_number() OVER (PARTITION BY grp_a, grp_b ORDER BY h, v) AS rn
       FROM pr),
agg AS (
  SELECT grp_a, grp_b, CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth_hash,
         CAST(sum(in_a * in_b) AS BIGINT) AS matches
  FROM rk WHERE rn <= {k} GROUP BY grp_a, grp_b
),
est AS (
  SELECT grp_a, grp_b, k_used, matches,
         CAST(CASE WHEN k_used < {k} THEN k_used
              ELSE {(k - 1) * KMV_M} // kth_hash END AS BIGINT) AS est_union
  FROM agg
),
ex AS (
  SELECT x.source AS grp_a, y.source AS grp_b,
         CAST(count(*) AS BIGINT) AS exact_intersection
  FROM d x JOIN d y ON x.v = y.v AND x.source < y.source
  GROUP BY x.source, y.source
)
SELECT e.grp_a, e.grp_b, e.k_used, e.matches, e.est_union,
       CAST(e.matches * e.est_union // e.k_used AS BIGINT) AS est_intersection,
       CAST(e.matches * 1000000 // e.k_used AS BIGINT) AS jaccard_micro,
       COALESCE(ex.exact_intersection, CAST(0 AS BIGINT)) AS exact_intersection
FROM est e LEFT JOIN ex USING (grp_a, grp_b)
"""


@register("q102_kmv_set_overlap", oracle=_kmv_overlap_oracle())
def q102_kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated distinct-term overlap between every source pair from
    their KMV sketches (operators/sketch.kmv_pairwise_overlap — Beyer et
    al. 2007 set algebra), exact intersections alongside. The corpus is
    scanned once for the sketches; the 190-pair stage runs on k·sources
    sketch rows — the 100 TB way to screen all source pairs for
    vocabulary overlap without a corpus self-join (the exact column here
    is the verification luxury the sketch replaces at scale)."""
    from openstack_billing_from_db_spark.operators import text
    from openstack_billing_from_db_spark.operators.sketch import (
        kmv_pairwise_overlap,
    )

    toks = _docs(spark, sf_dir).select(
        "source", F.explode(text.words(F.col("text"))).alias("v")
    )
    est = kmv_pairwise_overlap(toks, group_col="source", value_col="v", k=_KMV_K)
    d = toks.distinct()
    ex = (
        d.alias("x")
        .join(
            d.alias("y"),
            (F.col("x.v") == F.col("y.v"))
            & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("grp_a"), F.col("y.source").alias("grp_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    return est.join(ex, ["grp_a", "grp_b"], "left").withColumn(
        "exact_intersection", F.coalesce("exact_intersection", F.lit(0).cast("long"))
    )


# --- count-min frequency sketch ----------------------------------------------

_CM_K = 20


def _countmin_oracle() -> str:
    from openstack_billing_from_db_spark.operators.sketch import (
        CM_DEPTH,
        countmin_cell_sql,
    )

    build_rows = "\n    UNION ALL ".join(
        f"SELECT {i} AS cm_row, {countmin_cell_sql('term', i)} AS cm_bucket FROM tok"
        for i in range(CM_DEPTH)
    )
    probe_rows = "\n    UNION ALL ".join(
        f"SELECT term, exact_count, {i} AS cm_row,"
        f" {countmin_cell_sql('term', i)} AS cm_bucket FROM top"
        for i in range(CM_DEPTH)
    )
    return f"""
WITH wrd AS (SELECT {_W} AS w FROM documents),
tok AS (SELECT unnest(w) AS term FROM wrd),
exact AS (SELECT term, CAST(count(*) AS BIGINT) AS exact_count FROM tok GROUP BY term),
top AS (SELECT term, exact_count FROM exact ORDER BY exact_count DESC, term LIMIT {_CM_K}),
cells AS (
  SELECT cm_row, cm_bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
    {build_rows}
  ) GROUP BY cm_row, cm_bucket
),
pb AS (
    {probe_rows}
)
SELECT term, exact_count, min(cnt) AS est_count
FROM pb JOIN cells USING (cm_row, cm_bucket)
GROUP BY term, exact_count
"""


@register("q101_countmin_heavy_hitters", oracle=_countmin_oracle())
def q101_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimates for the corpus's top-{_CM_K} terms,
    exact counts alongside (operators/sketch.countmin_build/probe). The
    sketch is a FIXED d×w counter table (mergeable by addition — the
    windowed/streaming frequency state), built with one map-side explode
    and a partial-aggregated groupBy onto ≤ d·w cells; the probe joins
    the broadcast sketch. est ≥ exact always (collisions only add) —
    the oracle pins the exact min-over-rows arithmetic."""
    from openstack_billing_from_db_spark.operators import text
    from openstack_billing_from_db_spark.operators.caching import (
        tracked_persist,
    )
    from openstack_billing_from_db_spark.operators.sketch import (
        countmin_build,
        countmin_probe,
    )

    # both the sketch build and the exact-count groupBy read this
    # explode — persist so the scan/tokenize runs once (ADVICE r5; same
    # convention as q126's shared token stream)
    toks = tracked_persist(
        _docs(spark, sf_dir).select(
            F.explode(text.words(F.col("text"))).alias("term")
        )
    )
    sketch = countmin_build(toks, value_col="term")
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("term"))
        .limit(_CM_K)
    )
    return countmin_probe(sketch, top, value_col="term")


# --- corpus BPE encoding -----------------------------------------------------


def _bpe_encode_oracle() -> str:
    blocks = _bpe_cte_blocks(_BPE_MERGES)
    blocks.append(
        f"wtok AS (SELECT w, CAST(len(string_split(syms, ' ')) AS BIGINT)"
        f" AS n_tok FROM s{_BPE_MERGES})"
    )
    blocks.append(f"tok AS (SELECT doc_id, unnest({_W}) AS w FROM documents)")
    ctes = ",\n".join(blocks)
    return f"""WITH {ctes}
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens_bpe
FROM tok JOIN wtok USING (w)
GROUP BY doc_id"""


@register("q100_bpe_encode", oracle=_bpe_encode_oracle())
def q100_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization with the BPE rules trained on it
    (operators/bpe.bpe_encode): per-doc whitespace word count and
    post-merge token count. The merges are applied to the DISTINCT
    vocabulary only (each rule replayed in rank order), then the
    exploded corpus joins the broadcast word → token-count map — the
    oracle replays training AND encoding in one CTE chain, so a wrong
    merge order, a boundary-crossing replace, or a vocab/corpus join
    mismatch all hash-fail."""
    from openstack_billing_from_db_spark.operators.bpe import bpe_encode

    return bpe_encode(
        load_table(spark, sf_dir, "documents"), n_merges=_BPE_MERGES
    )


# --- HyperLogLog distinct-count sketch ----------------------------------------


@register(
    "q117_hll_distinct",
    oracle=f"""
WITH wrd AS (SELECT source, {_W} AS w FROM documents),
d AS (SELECT DISTINCT source, unnest(w) AS v FROM wrd)
{hll_distinct_sql(from_distinct_cte="d", group_col="source")}
""",
)
def q117_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-term cardinality via HyperLogLog
    (operators/sketch.py, m=64 registers) over the SAME distinct
    (source, term) stream as the in-gate q98 KMV sketch — the two
    mergeable-cardinality designs side by side. HLL's state is CONSTANT
    (m registers per group, merged by per-register max) where KMV's is
    k values merged by re-truncation: at 100 TB the HLL exchange is
    <= m rows per group whatever the vocabulary, and daily states
    compose by groupBy-max. The estimate arithmetic is engine-exact
    (see the sketch.py HLL header); only the small-range
    linear-counting branch rounds an ln() to milli-units."""
    from openstack_billing_from_db_spark.operators import text

    docs = _docs(spark, sf_dir)
    toks = docs.select("source", F.explode(text.words(F.col("text"))).alias("v"))
    return hll_distinct(toks, group_col="source", value_col="v")


# --- per-source distribution divergence ---------------------------------------


# Shared by q118 (per-source KL) and q134 (DoReMi reweighting, which
# consumes the q118 output as its excess-loss proxy).
_KL_CTES = f"""wrd AS (SELECT source, {_W} AS w FROM documents),
t AS (SELECT source AS g, unnest(w) AS wd FROM wrd),
csw AS (SELECT g, wd, count(*) AS c_gw FROM t GROUP BY g, wd),
ng AS (SELECT g, CAST(sum(c_gw) AS BIGINT) AS n_g,
              CAST(count(*) AS BIGINT) AS n_terms FROM csw GROUP BY g),
cw AS (SELECT wd, CAST(sum(c_gw) AS BIGINT) AS c_w FROM csw GROUP BY wd),
nt AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_all FROM cw),
con AS (
  SELECT c.g, ng.n_g, ng.n_terms,
         CAST(c.c_gw * ln((CAST(c.c_gw AS DOUBLE) * nt.n_all)
              / (CAST(ng.n_g AS DOUBLE) * cw.c_w)) AS DECIMAL(38,12)) AS kd
  FROM csw c JOIN cw USING (wd) JOIN ng USING (g) CROSS JOIN nt
)"""

_KL_FINAL = """SELECT g AS source, n_g AS n_tokens, n_terms,
       CAST(floor(CAST(sum(kd) AS DOUBLE) / n_g * 1e6 + 0.5) AS BIGINT) AS kl_micro
FROM con GROUP BY g, n_g, n_terms"""


@register(
    "q118_source_kl",
    oracle=f"""
WITH {_KL_CTES}
{_KL_FINAL}
""",
)
def q118_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence from the corpus blend
    (operators/text.unigram_kl_divergence) — the domain-shift metric a
    pretraining mixture monitors per slice/day: a source drifting away
    from the blend shows up as rising KL before it shows up in
    downstream evals. Contributions are decimal-cast pre-sum so the
    per-group total is order-independent and engine-exact; the token
    stream is read once (corpus counts derive from the per-source
    counts)."""
    from openstack_billing_from_db_spark.operators import text

    return text.unigram_kl_divergence(
        _docs(spark, sf_dir), group_col="source", text_col="text"
    )


# --- per-document token entropy ----------------------------------------------


@register(
    "q119_token_entropy",
    oracle=f"""
WITH wrd AS (SELECT doc_id, {_W} AS w FROM documents),
t AS (SELECT doc_id, unnest(w) AS wd FROM wrd),
c AS (SELECT doc_id, wd, count(*) AS c FROM t GROUP BY doc_id, wd),
p AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_terms,
         sum(CAST(c * ln(CAST(c AS DOUBLE)) AS DECIMAL(38,12))) AS clnc
  FROM c GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_terms, 0) AS BIGINT) AS n_terms,
       CAST(coalesce(
         CAST(floor((ln(CAST(p.n_tokens AS DOUBLE))
              - CAST(p.clnc AS DOUBLE) / p.n_tokens) * 1e6 + 0.5) AS BIGINT),
         0) AS BIGINT) AS entropy_micro
FROM documents d LEFT JOIN p USING (doc_id)
""",
)
def q119_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy
    (operators/text.token_entropy) — the gibberish/boilerplate quality
    signal orthogonal to the q76 LM score. Engine-exact: c·ln(c)
    contributions decimal-cast pre-sum; micro-nat rounding."""
    from openstack_billing_from_db_spark.operators import text

    return text.token_entropy(
        load_table(spark, sf_dir, "documents"), id_col="doc_id", text_col="text"
    )


# --- pairwise source Jensen-Shannon divergence -------------------------------


@register(
    "q121_js_divergence",
    oracle=f"""
WITH wrd AS (SELECT source AS g, {_W} AS w FROM documents),
t AS (SELECT g, unnest(w) AS wd FROM wrd),
csw AS (SELECT g, wd, count(*) AS c FROM t GROUP BY g, wd),
ng AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n,
         sum(CAST(c * ln(CAST(c AS DOUBLE)) AS DECIMAL(38,12))) AS clnc
  FROM csw GROUP BY g
),
hg AS (
  SELECT g, n, ln(CAST(n AS DOUBLE)) - CAST(clnc AS DOUBLE) / n AS h FROM ng
),
pairs AS (
  SELECT a.g AS ga, b.g AS gb FROM (SELECT g FROM ng) a
  JOIN (SELECT g FROM ng) b ON a.g < b.g
),
cswn AS (
  SELECT c.g, c.wd, CAST(c.c AS DOUBLE) / (2 * n.n) AS p_half
  FROM csw c JOIN ng n USING (g)
),
half AS (
  SELECT p.ga, p.gb, s.wd, s.p_half FROM cswn s JOIN pairs p ON s.g = p.ga
  UNION ALL
  SELECT p.ga, p.gb, s.wd, s.p_half FROM cswn s JOIN pairs p ON s.g = p.gb
),
mix AS (
  SELECT ga, gb, wd, sum(p_half) AS mw FROM half GROUP BY ga, gb, wd
),
hm AS (
  SELECT ga, gb, CAST(count(*) AS BIGINT) AS n_terms_union,
         sum(CAST(-(mw * ln(mw)) AS DECIMAL(38,12))) AS hm_dec
  FROM mix GROUP BY ga, gb
)
SELECT hm.ga AS source_a, hm.gb AS source_b, hm.n_terms_union,
       CAST(floor((CAST(hm.hm_dec AS DOUBLE) - (ha.h + hb.h) / 2) * 1e6 + 0.5)
            AS BIGINT) AS jsd_micro
FROM hm JOIN hg ha ON ha.g = hm.ga JOIN hg hb ON hb.g = hm.gb
""",
)
def q121_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every two sources'
    unigram distributions — the symmetric, bounded ([0, ln 2]) mixture
    distance a pretraining pipeline tracks between slices (q118's KL is
    the per-source-vs-blend view; this is the source×source matrix).

    Computed via the mixture-entropy identity
    JSD(P,Q) = H((P+Q)/2) − (H(P)+H(Q))/2, which needs NO outer join:
    the mixture distribution is one groupBy-sum over the two half-
    weighted count streams, and the per-source entropies reuse the q119
    algebra. Engine-exact: the only non-integer sums are decimal-cast
    pre-sum; the half-weights are single deterministic divisions.

    Scale shape: everything after the (source, word) count reduce is
    vocabulary-sized × a bounded source-pair dimension; the pair
    explosion multiplies the VOCAB stream, never the corpus."""
    from openstack_billing_from_db_spark.operators import text

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.col("source").alias("g"),
        F.explode(text.words(F.col("text"))).alias("wd"),
    )
    csw = toks.groupBy("g", "wd").agg(F.count(F.lit(1)).alias("c"))
    ng = csw.groupBy("g").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.expr("CAST(c * ln(CAST(c AS DOUBLE)) AS DECIMAL(38,12))")).alias(
            "clnc"
        ),
    )
    hg = ng.select(
        "g",
        "n",
        F.expr("ln(CAST(n AS DOUBLE)) - CAST(clnc AS DOUBLE) / n").alias("h"),
    )
    pairs = (
        ng.select(F.col("g").alias("ga"))
        .crossJoin(ng.select(F.col("g").alias("gb")))
        .filter(F.col("ga") < F.col("gb"))
    )
    cswn = csw.join(ng.select("g", "n"), "g").select(
        "g", "wd", F.expr("CAST(c AS DOUBLE) / (2 * n)").alias("p_half")
    )
    half = (
        cswn.join(F.broadcast(pairs), cswn.g == pairs.ga)
        .select("ga", "gb", "wd", "p_half")
        .unionByName(
            cswn.join(F.broadcast(pairs), cswn.g == pairs.gb).select(
                "ga", "gb", "wd", "p_half"
            )
        )
    )
    mix = half.groupBy("ga", "gb", "wd").agg(F.sum("p_half").alias("mw"))
    hm = mix.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_union"),
        F.sum(F.expr("CAST(-(mw * ln(mw)) AS DECIMAL(38,12))")).alias("hm_dec"),
    )
    ha = hg.select(F.col("g").alias("ga"), F.col("h").alias("h_a"))
    hb = hg.select(F.col("g").alias("gb"), F.col("h").alias("h_b"))
    return (
        hm.join(F.broadcast(ha), "ga")
        .join(F.broadcast(hb), "gb")
        .select(
            F.col("ga").alias("source_a"),
            F.col("gb").alias("source_b"),
            "n_terms_union",
            F.expr(
                "CAST(floor((CAST(hm_dec AS DOUBLE) - (h_a + h_b) / 2) * 1e6"
                " + 0.5) AS BIGINT)"
            ).alias("jsd_micro"),
        )
    )


# --- count-min sketch error evaluation ---------------------------------------


# deliberately UNDERSIZED sketch (d=2, w=16 vs the production 4x256):
# the synthetic corpus has a ~31-term vocabulary, so the default sketch
# never collides and the error profile would be trivially zero — the
# eval needs a load factor > 1 to measure anything, exactly like
# sizing width for a real vocabulary.
_CME_DEPTH = 2
_CME_WIDTH = 16


def _countmin_error_oracle() -> str:
    from openstack_billing_from_db_spark.operators.sketch import (
        countmin_cell_sql,
    )

    build_rows = "\n    UNION ALL ".join(
        f"SELECT {i} AS cm_row, {countmin_cell_sql('term', i, width=_CME_WIDTH)}"
        f" AS cm_bucket FROM tok"
        for i in range(_CME_DEPTH)
    )
    probe_rows = "\n    UNION ALL ".join(
        f"SELECT term, exact_count, {i} AS cm_row,"
        f" {countmin_cell_sql('term', i, width=_CME_WIDTH)} AS cm_bucket FROM exact"
        for i in range(_CME_DEPTH)
    )
    return f"""
WITH wrd AS (SELECT {_W} AS w FROM documents),
tok AS (SELECT unnest(w) AS term FROM wrd),
exact AS (SELECT term, CAST(count(*) AS BIGINT) AS exact_count FROM tok GROUP BY term),
cells AS (
  SELECT cm_row, cm_bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
    {build_rows}
  ) GROUP BY cm_row, cm_bucket
),
pb AS (
    {probe_rows}
),
est AS (
  SELECT term, exact_count, min(cnt) AS est_count
  FROM pb JOIN cells USING (cm_row, cm_bucket)
  GROUP BY term, exact_count
)
SELECT CAST(count(*) AS BIGINT) AS n_values,
       CAST(sum(exact_count) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN est_count > exact_count THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overestimated,
       CAST(sum(est_count - exact_count) AS BIGINT) AS total_overestimate,
       CAST(max(est_count - exact_count) AS BIGINT) AS max_overestimate
FROM est
"""


@register("q122_countmin_error", oracle=_countmin_error_oracle())
def q122_countmin_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch error profile over the WHOLE vocabulary — the
    q114/q116-style evaluation loop for the frequency-sketch family:
    probe every distinct term against a deliberately UNDERSIZED d×w
    sketch (load factor ~2 on this corpus's vocabulary) and aggregate
    how often and how badly the estimate overshoots (it can never
    undershoot — collisions only add; the oracle pins the same
    invariant). These are the numbers that size width/depth for a
    target error at a given vocabulary — measured, not guessed.
    Scale shape: the probe side is the vocabulary-sized exact-count
    table joining the broadcast d·w sketch; one final 1-row aggregate.
    Output: (n_values, n_tokens, n_overestimated, total_overestimate,
    max_overestimate)."""
    from openstack_billing_from_db_spark.operators import text
    from openstack_billing_from_db_spark.operators.caching import (
        tracked_persist,
    )
    from openstack_billing_from_db_spark.operators.sketch import (
        countmin_build,
        countmin_probe,
    )

    # both the sketch build and the exact-count groupBy read this
    # explode — persist so the scan/tokenize runs once (ADVICE r5; same
    # convention as q126's shared token stream)
    toks = tracked_persist(
        _docs(spark, sf_dir).select(
            F.explode(text.words(F.col("text"))).alias("term")
        )
    )
    sketch = countmin_build(
        toks, value_col="term", depth=_CME_DEPTH, width=_CME_WIDTH
    )
    exact = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    probed = countmin_probe(
        sketch, exact, value_col="term", depth=_CME_DEPTH, width=_CME_WIDTH
    )
    return probed.agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.sum("exact_count").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("est_count") > F.col("exact_count"), 1).otherwise(0))
        .cast("long")
        .alias("n_overestimated"),
        F.sum(F.col("est_count") - F.col("exact_count"))
        .cast("long")
        .alias("total_overestimate"),
        F.max(F.col("est_count") - F.col("exact_count"))
        .cast("long")
        .alias("max_overestimate"),
    )


# --- AMS F2 / self-join size estimate ----------------------------------------


def _ams_oracle() -> str:
    from openstack_billing_from_db_spark.operators.sketch import ams_f2_sql

    return f"""
WITH src AS (SELECT o_custkey FROM orders),
{ams_f2_sql(from_cte="src", value_expr="o_custkey")}
"""


@register("q124_ams_f2", oracle=_ams_oracle())
def q124_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war F2 estimate vs exact for the orders→customer join
    key: F2(o_custkey) IS the size of the orders self-join on customer —
    the constant-state join-size probe a planner consults before
    committing to an expensive strategy. All 9 estimator sums ride one
    map-side partial aggregation (1-row exchange); the exact side is
    the vocabulary-sized groupBy the sketch exists to predict.
    Beyond-reference; evaluation-loop sibling of q122/q114/q116."""
    from openstack_billing_from_db_spark.operators.sketch import ams_f2

    return ams_f2(
        load_table(spark, sf_dir, "orders").select("o_custkey"),
        value_col="o_custkey",
    )


# --- pairwise source cosine over tf-idf vectors ------------------------------


@register(
    "q126_source_cosine",
    oracle=f"""
WITH wrd AS (SELECT source AS g, {_W} AS w FROM documents),
t AS (SELECT g, unnest(w) AS wd FROM wrd),
csw AS (SELECT g, wd, count(*) AS c FROM t GROUP BY g, wd),
ns AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS s FROM csw),
dfw AS (SELECT wd, CAST(count(*) AS BIGINT) AS df FROM csw GROUP BY wd),
wv AS (
  SELECT g, wd,
         CAST(c AS DOUBLE) * (1 + ln(CAST(s + 1 AS DOUBLE) / (df + 1))) AS w
  FROM csw JOIN dfw USING (wd) CROSS JOIN ns
),
nrm AS (
  SELECT g, sqrt(CAST(sum(CAST(w * w AS DECIMAL(38,12))) AS DOUBLE)) AS nn
  FROM wv GROUP BY g
),
dots AS (
  SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS n_shared_terms,
         CAST(sum(CAST(a.w * b.w AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM wv a JOIN wv b ON b.wd = a.wd AND a.g < b.g
  GROUP BY a.g, b.g
)
SELECT d.ga AS source_a, d.gb AS source_b, d.n_shared_terms,
       CAST(floor(d.dot / (na.nn * nb.nn) * 1e6 + 0.5) AS BIGINT) AS cosine_micro
FROM dots d JOIN nrm na ON na.g = d.ga JOIN nrm nb ON nb.g = d.gb
""",
)
def q126_source_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between every two sources' tf-idf
    unigram vectors — the sparse-vector complement to q121's
    distributional JSD, and the pattern that matters at scale: the dot
    products come from an INVERTED-INDEX join (term-keyed equi-join of
    the per-source weight streams), never from materialized dense
    vectors — per term the join fans out at most sources² pair rows,
    so the pair dimension multiplies the VOCABULARY, never the corpus.

    Engine-exact: weights are deterministic double products
    (count × smooth-idf, 1 + ln((S+1)/(df+1)) — never zero, so no
    zero-norm vectors and no ANSI divide-by-zero); every sum is decimal-cast pre-sum
    (order-independent); sqrt/ln are the platform libm on both engines
    (the q121 precedent). Output: (source_a, source_b, n_shared_terms,
    cosine_micro)."""
    from openstack_billing_from_db_spark.operators import text
    from openstack_billing_from_db_spark.operators.caching import tracked_persist

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.col("source").alias("g"),
        F.explode(text.words(F.col("text"))).alias("wd"),
    )
    # persisted: csw feeds the source count, the df table AND the weight
    # stream; wv feeds the norms and BOTH sides of the term self-join —
    # without these the corpus tokenize/count pipeline re-runs ~6x
    csw = tracked_persist(
        toks.groupBy("g", "wd").agg(F.count(F.lit(1)).alias("c"))
    )
    ns = csw.agg(F.count_distinct("g").cast("long").alias("s"))
    dfw = csw.groupBy("wd").agg(F.count(F.lit(1)).cast("long").alias("df"))
    wv = tracked_persist(
        csw.crossJoin(F.broadcast(ns))
        .join(dfw, "wd")
        .select(
            "g",
            "wd",
            F.expr(
                "CAST(c AS DOUBLE) * (1 + ln(CAST(s + 1 AS DOUBLE) / (df + 1)))"
            ).alias("w"),
        )
    )
    nrm = wv.groupBy("g").agg(
        F.expr(
            "sqrt(CAST(sum(CAST(w * w AS DECIMAL(38,12))) AS DOUBLE))"
        ).alias("nn")
    )
    dots = (
        wv.alias("a")
        .join(
            wv.alias("b"),
            (F.col("b.wd") == F.col("a.wd")) & (F.col("a.g") < F.col("b.g")),
        )
        .groupBy(F.col("a.g").alias("ga"), F.col("b.g").alias("gb"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
            F.expr(
                "CAST(sum(CAST(a.w * b.w AS DECIMAL(38,12))) AS DOUBLE)"
            ).alias("dot"),
        )
    )
    na = nrm.select(F.col("g").alias("ga"), F.col("nn").alias("na"))
    nb = nrm.select(F.col("g").alias("gb"), F.col("nn").alias("nb"))
    return (
        dots.join(F.broadcast(na), "ga")
        .join(F.broadcast(nb), "gb")
        .select(
            F.col("ga").alias("source_a"),
            F.col("gb").alias("source_b"),
            "n_shared_terms",
            F.expr(
                "CAST(floor(dot / (na * nb) * 1e6 + 0.5) AS BIGINT)"
            ).alias("cosine_micro"),
        )
    )


# --- DoReMi-style domain reweighting (round 6) --------------------------------

_DOREMI_ETA = 100  # step size per nat (corpus-blend KLs here are ~0.01 nat)
_DOREMI_SMOOTH = 100_000  # uniform-smoothing mass, micro-units (c = 0.1)


# The full KL -> exponentiated-gradient -> smoothed-weights chain,
# shared by q134 (reports the weights) and q136 (spends them as
# per-source token budgets). Edit in one place only.
_DOREMI_W_CTES = f"""kl AS ({_KL_FINAL}),
ew AS (
  SELECT source, n_tokens, kl_micro,
         CAST(floor(exp(CAST(kl_micro AS DOUBLE) * {_DOREMI_ETA} / 1000000)
              * 1000000000 + 0.5) AS BIGINT) AS e
  FROM kl
),
tot AS (SELECT CAST(sum(e) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM ew),
wts AS (
  SELECT source, n_tokens, kl_micro,
         CAST((({1_000_000 - _DOREMI_SMOOTH}) * ((e * 1000000) // s)
              + {_DOREMI_SMOOTH} * (1000000 // n)) // 1000000 AS BIGINT)
           AS weight_micro
  FROM ew CROSS JOIN tot
)"""


@register(
    "q134_doremi_weights",
    oracle=f"""
WITH {_KL_CTES},
{_DOREMI_W_CTES}
SELECT source, n_tokens, kl_micro, weight_micro FROM wts
""",
)
def q134_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture domain weights via a DoReMi-style exponentiated-
    gradient update (operators/sampling.doremi_domain_weights; Xie et
    al. 2023): per-source unigram KL from the corpus blend (the q118
    metric) is the excess-loss proxy, w_d ∝ exp(η·KL_d) smoothed 10%
    with uniform — the data-mixing step between divergence monitoring
    (q118) and mixture sampling (q79 temperature mix / q131 DSIR). One
    exp() per domain rounded once to nano-units; everything after is
    integer floor-arithmetic, so weight_micro is engine-exact. The
    domain table is ~tens of rows: the corpus is touched only by the
    audited q118 aggregation chain."""
    from openstack_billing_from_db_spark.operators import sampling, text

    kl = text.unigram_kl_divergence(
        _docs(spark, sf_dir), group_col="source", text_col="text"
    ).drop("n_terms")
    return sampling.doremi_domain_weights(
        kl,
        group_col="source",
        kl_col="kl_micro",
        eta_per_nat=_DOREMI_ETA,
        smooth_micro=_DOREMI_SMOOTH,
    )


# --- mixture-weighted epoch construction (round 6) ----------------------------

_MIX_TOTAL_BUDGET = 40_000  # global tokens per epoch (~2k/source uniform)
_MIX_SEED = "mix-epoch0"


def _q136_oracle() -> str:
    h = seeded_hash64_sql("CAST(doc_id AS VARCHAR)", _MIX_SEED)
    return f"""
WITH {_KL_CTES},
{_DOREMI_W_CTES},
bud AS (
  SELECT source, weight_micro,
         CAST(({_MIX_TOTAL_BUDGET} * weight_micro) // 1000000 AS BIGINT)
           AS budget_tokens
  FROM wts
),
dt AS (
  SELECT source, doc_id AS id, CAST(len({_W}) AS BIGINT) AS n_tokens,
         {h} AS hh
  FROM documents
),
dc AS (
  SELECT source, id, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY hh, id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum
  FROM dt
),
kept AS (
  SELECT dc.source, dc.n_tokens
  FROM dc JOIN bud USING (source)
  WHERE dc.cum <= bud.budget_tokens
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
  FROM kept GROUP BY source
)
SELECT b.source, b.weight_micro, b.budget_tokens,
       CAST(coalesce(a.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(coalesce(a.tokens_kept, 0) AS BIGINT) AS tokens_kept
FROM bud b LEFT JOIN agg a USING (source)
"""


@register("q136_mixture_epoch", oracle=_q136_oracle())
def q136_mixture_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weighted epoch: the q134 DoReMi weights SPENT as data —
    a global token budget is split across sources in proportion to
    weight_micro (budget_d = total·w_d div 1e6, floor-exact), then each
    source admits documents in seeded-hash order until its share fills
    (the q127 kernel, per-source quota instead of uniform). This closes
    the data-mixing loop: divergence (q118) → weights (q134) → epoch.
    Output is the per-source mixture report (weight, budget, docs and
    tokens admitted); sources whose floor budget starves below their
    first document admit zero rows and report zeros.

    Plan shape (operators/sampling.mixture_epoch_sample): the weight
    table is tens of rows and rides a BROADCAST join onto the corpus
    scan; admission is one exchange on source + a per-source window
    cumsum (the hash-prefix pregate bounds the sort at scale); the
    report is a partial-agg rollup left-joined back to the weights."""
    from openstack_billing_from_db_spark.operators import sampling, text

    docs = _docs(spark, sf_dir)
    kl = text.unigram_kl_divergence(
        docs, group_col="source", text_col="text"
    ).drop("n_terms")
    weights = sampling.doremi_domain_weights(
        kl,
        group_col="source",
        kl_col="kl_micro",
        eta_per_nat=_DOREMI_ETA,
        smooth_micro=_DOREMI_SMOOTH,
    )
    kept = sampling.mixture_epoch_sample(
        docs,
        weights,
        total_budget_tokens=_MIX_TOTAL_BUDGET,
        seed=_MIX_SEED,
    )
    report = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens_kept"),
    )
    budgets = weights.select(
        "source",
        "weight_micro",
        F.expr(
            f"CAST(({_MIX_TOTAL_BUDGET} * weight_micro) div 1000000"
            " AS BIGINT)"
        ).alias("budget_tokens"),
    )
    return budgets.join(F.broadcast(report), "source", "left").select(
        "source",
        "weight_micro",
        "budget_tokens",
        F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce(F.col("tokens_kept"), F.lit(0)).cast("long").alias("tokens_kept"),
    )


# --- stratified QA design + bootstrap uncertainty (round 6) -------------------

_NEYMAN_BUDGET = 1000  # labeling budget (rows) to allocate across sources


def _q137_oracle() -> str:
    from openstack_billing_from_db_spark.plans.pipeline_queries import (
        _QMICRO_SQL,
    )

    return f"""
WITH qv AS (SELECT source, CAST({_QMICRO_SQL} AS BIGINT) AS qm FROM documents),
g AS (
  SELECT source AS grp, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qm) AS BIGINT) AS s, CAST(sum(qm * qm) AS BIGINT) AS ss
  FROM qv GROUP BY source
),
sdv AS (
  SELECT *, CAST(floor(sqrt(greatest(CAST(ss AS DOUBLE) / n
             - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 0.0))
             + 0.5) AS BIGINT) AS sd
  FROM g
),
wv AS (SELECT *, n * sd AS w FROM sdv),
tt AS (SELECT CAST(sum(w) AS BIGINT) AS wt, CAST(sum(n) AS BIGINT) AS nt FROM wv)
SELECT grp AS source, n AS n_docs,
       CAST(s // n AS BIGINT) AS mean_value,
       sd AS sd_value,
       CAST(({_NEYMAN_BUDGET} * w) // greatest(wt, 1) AS BIGINT) AS alloc_neyman,
       CAST(({_NEYMAN_BUDGET} * n) // nt AS BIGINT) AS alloc_prop
FROM wv CROSS JOIN tt
"""


@register("q137_neyman_allocation", oracle=_q137_oracle())
def q137_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal labeling-budget allocation across sources
    (operators/sampling.neyman_allocation; Neyman 1934): each stratum's
    share of a {_NEYMAN_BUDGET}-row human-QA budget is ∝ n_d·σ_d of its
    integer quality score (q135's engine-exact grid), with the
    proportional allocation alongside for contrast — the survey-design
    step between quality scoring and human review that minimizes the
    stratified estimator's variance. Moment sums are exact BIGINT
    partial aggregates; σ_d is one deterministic double expression
    rounded once to integer units (the round-once pattern); the
    allocations are pure floor-arithmetic. The corpus is touched by ONE
    partial-aggregable groupBy; the grand total rides a 1-row
    broadcast."""
    from openstack_billing_from_db_spark.operators.sampling import (
        neyman_allocation,
    )
    from openstack_billing_from_db_spark.operators.text import (
        quality_score_micro,
    )

    scored = _docs(spark, sf_dir).select(
        "source", quality_score_micro(F.col("text")).alias("quality_micro")
    )
    return neyman_allocation(
        scored,
        group_col="source",
        value_col="quality_micro",
        total_samples=_NEYMAN_BUDGET,
    )


_BOOT_B = 40
_BOOT_SEED = "boot"


def _q138_oracle() -> str:
    from openstack_billing_from_db_spark.operators.sampling import (
        poisson_bootstrap_thresholds,
    )
    from openstack_billing_from_db_spark.plans.pipeline_queries import (
        _QMICRO_SQL,
    )

    ts = poisson_bootstrap_thresholds()
    hcols = ",\n         ".join(
        f"{seeded_hash64_sql('CAST(doc_id AS VARCHAR)', f'{_BOOT_SEED}{b}')} AS h{b}"
        for b in range(_BOOT_B)
    )
    wcols = ",\n         ".join(
        "("
        + " + ".join(f"(CASE WHEN h{b} >= {t} THEN 1 ELSE 0 END)" for t in ts)
        + f") AS w{b}"
        for b in range(_BOOT_B)
    )
    scols = ",\n         ".join(
        f"CAST(sum(w{b} * qm) AS BIGINT) AS s{b},"
        f" CAST(sum(w{b}) AS BIGINT) AS n{b}"
        for b in range(_BOOT_B)
    )
    mean_branches = "\n  UNION ALL ".join(
        f"SELECT {b} AS b, CAST(s{b} // greatest(n{b}, 1) AS BIGINT) AS m FROM agg"
        for b in range(_BOOT_B)
    )
    return f"""
WITH hv AS (
  SELECT doc_id, CAST({_QMICRO_SQL} AS BIGINT) AS qm,
         {hcols}
  FROM documents
),
wv AS (
  SELECT qm,
         {wcols}
  FROM hv
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(sum(qm) AS BIGINT) AS s_all,
         {scols}
  FROM wv
),
means AS (
  {mean_branches}
),
rk AS (SELECT b, m, row_number() OVER (ORDER BY m, b) AS rn FROM means)
SELECT (SELECT n_rows FROM agg) AS n_docs,
       (SELECT CAST(s_all // greatest(n_rows, 1) AS BIGINT) FROM agg)
         AS point_mean,
       (SELECT m FROM rk WHERE rn = 2) AS ci_lo,
       (SELECT m FROM rk WHERE rn = {_BOOT_B - 1}) AS ci_hi,
       CAST({_BOOT_B} AS BIGINT) AS n_replicas
"""


@register("q138_bootstrap_quality_ci", oracle=_q138_oracle())
def q138_bootstrap_quality_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap confidence interval for the corpus mean
    quality score (operators/sampling.poisson_bootstrap_mean_ci; Efron
    1979, Poisson(1) streaming form after Chamandy et al. 2012) — the
    error bar the point-estimate dashboards (q31/q118/q134) lack. All
    {_BOOT_B} replicas accumulate in ONE corpus scan as partial-
    aggregable (Σw·v, Σw) pairs — replica weights are inverse-CDF
    lookups of a per-(doc, replica) seeded hash against precomputed
    integer thresholds, so there is no corpus×B explode, no RNG state,
    and both engines replay the draws bit-identically; replica means
    are BIGINT floor-divisions and the CI is an order statistic of the
    {_BOOT_B} means."""
    from openstack_billing_from_db_spark.operators.sampling import (
        poisson_bootstrap_mean_ci,
    )
    from openstack_billing_from_db_spark.operators.text import (
        quality_score_micro,
    )

    scored = _docs(spark, sf_dir).select(
        "doc_id", quality_score_micro(F.col("text")).alias("quality_micro")
    )
    return poisson_bootstrap_mean_ci(
        scored,
        id_col="doc_id",
        value_col="quality_micro",
        n_replicas=_BOOT_B,
        seed=_BOOT_SEED,
    )
