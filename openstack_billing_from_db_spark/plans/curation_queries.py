"""Round-4 curation registry entries: token-window chunking, TF-IDF
top-terms, Bloom-prefiltered decontamination, segment-level exact dedup,
and linear quality classification — the document-preparation operations
a training-data pipeline runs between cleaning and batch assembly.

Each is a (Spark plan, DuckDB oracle) pair; all math is engine-portable
(integer/hash arithmetic only — see registry.py header). The reference
(CCI-MOC/openstack-billing-from-db) has no corpus operators; these are
beyond-reference components in the SURVEY.md §2 sense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.functions.hashing import (
    seeded_hash64,
    seeded_hash64_sql,
)
from openstack_billing_from_db_spark.operators import text
from openstack_billing_from_db_spark.operators.curation import (
    WORDS_SQL as _W,
    adaptive_bloom_bits,
    adaptive_bloom_bits_sql,
    bloom_positions,
    bloom_positions_sql,
    bloom_probe_auto,
    build_bloom_bitset_distributed,
    fixed_segments,
    linear_logit_micro,
    token_chunks,
)
from openstack_billing_from_db_spark.operators.parallelism import (
    ensure_map_parallelism,
)
from openstack_billing_from_db_spark.registry import register
from openstack_billing_from_db_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ensure_map_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


# --- token-window chunking ---------------------------------------------------

_CHUNK, _STRIDE = 32, 24


@register(
    "q89_doc_chunks",
    oracle=f"""
WITH wrd AS (SELECT doc_id, {_W} AS w FROM documents),
ix AS (
  SELECT doc_id, w,
         unnest(range(0, greatest(len(w) - 1, 0) // {_STRIDE} + 1)) AS chunk_id
  FROM wrd
)
SELECT doc_id, chunk_id,
       CAST(len(w[(chunk_id*{_STRIDE}+1):(chunk_id*{_STRIDE}+{_CHUNK})]) AS BIGINT) AS n_tokens,
       array_to_string(w[(chunk_id*{_STRIDE}+1):(chunk_id*{_STRIDE}+{_CHUNK})], ' ') AS chunk_text
FROM ix
WHERE chunk_id * {_STRIDE} < len(w)
""",
)
def q89_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking ({_CHUNK}-token chunks, stride
    {_STRIDE}) — the RAG / context-window sequence-prep primitive. Pure
    map-side (one explode, no shuffle): at 100 TB it scales with input
    splits alone and stays inside whole-stage codegen."""
    return token_chunks(_docs(spark, sf_dir), chunk_size=_CHUNK, stride=_STRIDE)


# --- TF-IDF top-k terms ------------------------------------------------------

_TFIDF_K = 5
_TFIDF_SCALE = 1_000_000


@register(
    "q90_tfidf_topk",
    oracle=f"""
WITH wrd AS (SELECT doc_id, {_W} AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS term FROM wrd),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         (tf.tf * n.n_docs * {_TFIDF_SCALE}) // dfq.df AS score_micro
  FROM tf JOIN dfq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, score_micro,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY score_micro DESC, term) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= {_TFIDF_K}
""",
)
def q90_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TFIDF_K} TF-IDF terms per document. The idf is kept as the
    exact integer ratio ``tf * N * 1e6 // df`` (monotone in tf·N/df) so
    the oracle is bit-exact; the production path would use ``ln(N/df)``
    doubles (same ranking, engine-dependent last ulp). Shape at scale:
    two narrow partial-aggregated shuffles — (doc,term) term counts,
    then term→df — a term-keyed join Catalyst/AQE can broadcast when the
    vocabulary is small, and a per-doc top-k window. No token strings
    ever shuffle twice: df rides the (term, df) dim."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(text.words(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.expr(f"(tf * n_docs * {_TFIDF_SCALE}L) div df").alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_micro"), F.asc("term"))
    return scored.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= _TFIDF_K
    )


# --- Bloom-prefiltered decontamination ---------------------------------------

_BF_N = 4  # n-gram width (matches q68)
_BF_K = 3  # hash functions
_EVAL_HASH = seeded_hash64_sql("CAST(doc_id AS VARCHAR)", "eval")
# filter bits scale with the eval-gram count (x100 sweep: a fixed 64k-bit
# filter saturates at 100x and the prefilter degenerates to a no-op);
# both engines derive the same power of two from the same COUNT
_BF_M_SQL = adaptive_bloom_bits_sql("SELECT count(*) FROM ev")
_BF_POS = bloom_positions_sql("gh", _BF_K, f"({_BF_M_SQL})")
_BF_IN = " AND ".join(f"{p} IN (SELECT pos FROM evpos)" for p in _BF_POS)


@register(
    "q91_bloom_decontaminate",
    oracle=f"""
WITH wrd AS (SELECT doc_id, {_W} AS w FROM documents),
g AS (
  SELECT DISTINCT doc_id, {seeded_hash64_sql("ng", "ng")} AS gh
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - {_BF_N - 2}),
                                 i -> array_to_string(w[i:i+{_BF_N - 1}], ' '))) AS ng
    FROM wrd WHERE len(w) >= {_BF_N}
  )
),
ev AS (SELECT doc_id AS eval_id, gh FROM g WHERE {_EVAL_HASH} % 20 = 0),
tr AS (SELECT doc_id AS train_id, gh FROM g WHERE {_EVAL_HASH} % 20 != 0),
evpos AS (
  SELECT DISTINCT pos FROM (
    {" UNION ALL ".join(f"SELECT {p} AS pos FROM ev" for p in _BF_POS)}
  )
),
cand AS (SELECT train_id, gh FROM tr WHERE {_BF_IN}),
shared AS (SELECT train_id, gh FROM cand WHERE gh IN (SELECT gh FROM ev)),
base AS (SELECT train_id, count(*) AS n_grams FROM tr GROUP BY train_id),
cc AS (SELECT train_id, count(*) AS n_bloom_candidates FROM cand GROUP BY train_id),
sc AS (SELECT train_id, count(*) AS n_shared FROM shared GROUP BY train_id)
SELECT base.train_id, base.n_grams,
       coalesce(cc.n_bloom_candidates, CAST(0 AS BIGINT)) AS n_bloom_candidates,
       coalesce(sc.n_shared, CAST(0 AS BIGINT)) AS n_shared,
       coalesce(sc.n_shared, CAST(0 AS BIGINT)) > 0 AS contaminated
FROM base LEFT JOIN cc USING (train_id) LEFT JOIN sc USING (train_id)
""",
)
def q91_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered eval-set decontamination. q68 joins every
    training n-gram against the eval grams; here the eval grams are
    first folded into a Bloom bitset ({_BF_K} portable hash functions)
    that rides the plan as an array<bigint> literal, so the membership
    probe is map-side whole-stage-codegen — only Bloom *candidates*
    reach the exact verify join. The filter size is ADAPTIVE: the
    smallest power of two ≥ 8 bits per eval gram (the x100 sweep
    measured a fixed 64k-bit filter saturating — FP → 1 — at 100×; at
    ~8 bits/key with k=3 the FP rate stays ≈ 2.5% at any scale, and
    the bitset grows with the EVAL set, which is always a sliver of
    the corpus). False positives are removed by the verify join and
    false negatives are impossible, so the output is exact. The oracle
    derives the same power of two from the same COUNT and reproduces
    the bitset as a 3-way semi-join against the same positions.
    Output: per training doc, its distinct-gram count, how many grams
    survived the Bloom probe, how many truly match an eval gram, and
    the contamination flag."""
    from openstack_billing_from_db_spark.operators.caching import tracked_persist

    docs = _docs(spark, sf_dir)
    # persisted: the bitset build collects positions from the eval slice
    # BEFORE the main query runs, and the verify join reads the eval side
    # again — without this the shingle+distinct stream evaluates 3×
    grams = tracked_persist(
        docs.select(
            "doc_id",
            F.explode(text.word_shingles(text.words(F.col("text")), _BF_N)).alias("ng"),
        )
        .select("doc_id", seeded_hash64(F.col("ng"), "ng").alias("gh"))
        .distinct()
    )
    is_eval = seeded_hash64(F.col("doc_id").cast("string"), "eval") % 20 == 0
    ev = grams.filter(is_eval).select(F.col("doc_id").alias("eval_id"), "gh")
    tr = grams.filter(~is_eval).select(F.col("doc_id").alias("train_id"), "gh")

    m_bits = adaptive_bloom_bits(ev.count())
    pos_cols = [f"bfpos{i}" for i in range(_BF_K)]
    ev_pos = ev.select(
        F.explode(F.array(*bloom_positions(F.col("gh"), _BF_K, m_bits))).alias("pos")
    )
    # driver barrier bounded by the filter size (≤ m_bits/64 word rows,
    # OR-folded executor-side), never by the eval-gram count
    bitset = build_bloom_bitset_distributed(ev_pos, m_bits)

    tr_pos = tr.select("train_id", "gh", *bloom_positions(F.col("gh"), _BF_K, m_bits))
    cand = bloom_probe_auto(tr_pos, bitset, pos_cols).select("train_id", "gh")
    shared = cand.join(ev.select("gh").distinct(), "gh", "left_semi")

    zero = F.lit(0).cast("long")
    base = tr.groupBy("train_id").agg(F.count(F.lit(1)).alias("n_grams"))
    cc = cand.groupBy("train_id").agg(F.count(F.lit(1)).alias("n_bloom_candidates"))
    sc = shared.groupBy("train_id").agg(F.count(F.lit(1)).alias("n_shared"))
    return (
        base.join(cc, "train_id", "left")
        .join(sc, "train_id", "left")
        .select(
            "train_id",
            "n_grams",
            F.coalesce("n_bloom_candidates", zero).alias("n_bloom_candidates"),
            F.coalesce("n_shared", zero).alias("n_shared"),
            (F.coalesce("n_shared", zero) > 0).alias("contaminated"),
        )
    )


# --- segment-level exact dedup -----------------------------------------------

_SEG = 8  # tokens per segment


@register(
    "q92_segment_dedup",
    oracle=f"""
WITH wrd AS (SELECT doc_id, {_W} AS w FROM documents),
seg AS (
  SELECT doc_id, ci AS seg_idx,
         array_to_string(w[(ci*{_SEG}+1):(ci*{_SEG}+{_SEG})], ' ') AS seg_text
  FROM (SELECT doc_id, w,
               unnest(range(0, greatest(len(w) - 1, 0) // {_SEG} + 1)) AS ci
        FROM wrd)
  WHERE ci * {_SEG} < len(w)
),
h AS (SELECT doc_id, seg_idx, seg_text,
             {seeded_hash64_sql("seg_text", "seg")} AS segh,
             doc_id * 1000000 + seg_idx AS packed
      FROM seg),
f AS (SELECT segh, min(packed) AS first_packed FROM h GROUP BY segh)
SELECT doc_id,
       count(*) AS n_segments,
       count(*) FILTER (WHERE packed = first_packed) AS n_kept,
       count(*) - count(*) FILTER (WHERE packed = first_packed) AS n_removed,
       md5(coalesce(string_agg(CASE WHEN packed = first_packed THEN seg_text END,
                               ' ' ORDER BY seg_idx), '')) AS clean_md5
FROM h JOIN f USING (segh)
GROUP BY doc_id
""",
)
def q92_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level exact dedup (C4/RefinedWeb line-dedup shape):
    split every document into non-overlapping {_SEG}-token segments,
    keep only the globally-first occurrence of each distinct segment
    (first = smallest (doc_id, seg_idx)), and re-assemble the surviving
    text. First-occurrence is computed as a partial-aggregated
    ``min(packed_position)`` per segment hash — NOT a row_number window
    — so a segment duplicated a billion times costs a map-side combine,
    not a single-partition window sort (skew-safe at 100 TB). Output:
    per doc, segment counts kept/removed and the md5 of the re-joined
    surviving text (order-preserved via sorted struct re-assembly)."""
    segs = (
        fixed_segments(_docs(spark, sf_dir), seg_size=_SEG)
        .withColumn("segh", seeded_hash64(F.col("seg_text"), "seg"))
        .withColumn("packed", F.col("doc_id") * 1000000 + F.col("seg_idx"))
    )
    firsts = segs.groupBy("segh").agg(F.min("packed").alias("first_packed"))
    j = segs.join(firsts, "segh")
    keep = F.col("packed") == F.col("first_packed")
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.count(F.when(keep, 1)).alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(keep, F.struct("seg_idx", "seg_text"))
                            )
                        ),
                        lambda x: x["seg_text"],
                    ),
                    " ",
                )
            ).alias("clean_md5"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_kept",
            (F.col("n_segments") - F.col("n_kept")).alias("n_removed"),
            "clean_md5",
        )
    )


# --- linear quality classifier -----------------------------------------------

# integer-micro weights, "fitted offline" (deterministic literals here;
# at scale the fit runs on a driver-sized labeled sample and scoring —
# this query — is the distributed path)
_CLS_BIAS = -1_200_000
_CLS_W_NWORDS = 20_000
_CLS_W_STOP = 2
_CLS_W_TTR = 1

_STOPS = text.LANG_STOPWORDS["en"]
_STOPS_SQL = ", ".join(f"'{s}'" for s in _STOPS)
_LOGIT_SQL = (
    f"({_CLS_BIAS} + {_CLS_W_NWORDS} * n_words"
    f" + {_CLS_W_STOP} * stop_ratio_micro + {_CLS_W_TTR} * ttr_micro)"
)


@register(
    "q93_quality_classifier",
    oracle=f"""
WITH wrd AS (SELECT doc_id, text, {_W} AS w FROM documents),
feat AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(list_filter(w, x -> list_contains([{_STOPS_SQL}], x))) AS BIGINT) AS n_stop,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
  FROM wrd
),
r AS (
  SELECT doc_id, n_words, n_chars,
         (n_stop * 1000000) // greatest(n_words, 1) AS stop_ratio_micro,
         (n_distinct * 1000000) // greatest(n_words, 1) AS ttr_micro
  FROM feat
)
SELECT doc_id, n_words, n_chars, stop_ratio_micro, ttr_micro,
       {_LOGIT_SQL} AS logit_micro,
       {_LOGIT_SQL} > 0 AS keep
FROM r
""",
)
def q93_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier scoring (the fastText/logistic-filter
    shape every pretraining pipeline runs): integer features — token
    count, stopword ratio, type-token ratio — dotted with offline
    -fitted integer-micro weights, keep iff logit > 0. All-BIGINT
    arithmetic keeps the oracle bit-exact; the plan is a pure map-side
    projection (no shuffle, whole-stage codegen) that scales with input
    splits alone."""
    docs = _docs(spark, sf_dir)
    w = text.words(F.col("text"))
    feats = docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_words"),
        F.length("text").cast("long").alias("n_chars"),
        text.stopword_hits(w, _STOPS).alias("n_stop"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct"),
    ).select(
        "doc_id",
        "n_words",
        "n_chars",
        F.expr("(n_stop * 1000000L) div greatest(n_words, 1L)").alias(
            "stop_ratio_micro"
        ),
        F.expr("(n_distinct * 1000000L) div greatest(n_words, 1L)").alias("ttr_micro"),
    )
    logit = linear_logit_micro(
        {"n_words": _CLS_W_NWORDS, "stop_ratio_micro": _CLS_W_STOP, "ttr_micro": _CLS_W_TTR},
        _CLS_BIAS,
    )
    return feats.select(
        "doc_id",
        "n_words",
        "n_chars",
        "stop_ratio_micro",
        "ttr_micro",
        logit.alias("logit_micro"),
        (logit > 0).alias("keep"),
    )


# --- incremental dedup against a signature index -----------------------------

from openstack_billing_from_db_spark.functions.hashing import portable_hash64_sql
from openstack_billing_from_db_spark.operators import dedup as _dedup

_INC_NUM_HASHES = 12
_INC_ROWS_PER_BAND = 2
_INC_SHINGLE_N = 3
_INC_MIN_AGREE = 6
_INC_P = _dedup.MINHASH_P
_INC_MH_PARAMS = "(VALUES " + ", ".join(
    f"({j}, CAST({a} AS BIGINT), CAST({b} AS BIGINT))"
    for j, (a, b) in enumerate(_dedup.minhash_coefficients(_INC_NUM_HASHES))
) + ")"
_BATCH_HASH = seeded_hash64_sql("CAST(doc_id AS VARCHAR)", "batch")

# the shared signature-build CTE block (shingles → portable minhash →
# banded md5 sigs) replayed by BOTH q94's one-batch oracle and q159's
# two-epoch admission oracle — byte-identical text, one source of truth
_INC_SIG_CTES = f"""wrd AS (SELECT doc_id, {_W} AS w FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - {_INC_SHINGLE_N - 2}),
                               i -> array_to_string(w[i:i+{_INC_SHINGLE_N - 1}], ' '))) AS shingle
  FROM wrd WHERE len(w) >= {_INC_SHINGLE_N}
),
shh AS (SELECT doc_id, {portable_hash64_sql("shingle")} % {_INC_P} AS hh FROM sh),
mh AS MATERIALIZED (
  SELECT doc_id, p.j, min((p.a * hh + p.b) % {_INC_P}) AS mh
  FROM shh CROSS JOIN {_INC_MH_PARAMS} AS p(j, a, b)
  GROUP BY doc_id, p.j
),
bands AS MATERIALIZED (
  SELECT doc_id, j // {_INC_ROWS_PER_BAND} AS band,
         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j)) AS sig
  FROM mh GROUP BY doc_id, j // {_INC_ROWS_PER_BAND}
)"""


@register(
    "q94_incremental_dedup",
    oracle=f"""
WITH {_INC_SIG_CTES},
newdoc AS (SELECT DISTINCT doc_id FROM sh WHERE {_BATCH_HASH} % 10 = 0),
cand AS (
  SELECT DISTINCT nb.doc_id AS new_id, ob.doc_id AS other_id
  FROM bands nb
  JOIN bands ob ON nb.band = ob.band AND nb.sig = ob.sig
              AND ob.doc_id != nb.doc_id
  WHERE nb.doc_id IN (SELECT doc_id FROM newdoc)
),
agree AS (
  SELECT c.new_id, c.other_id, count(*) FILTER (WHERE a.mh = b.mh) AS n_agree
  FROM cand c
  JOIN mh a ON a.doc_id = c.new_id
  JOIN mh b ON b.doc_id = c.other_id AND b.j = a.j
  GROUP BY c.new_id, c.other_id
),
best AS (
  SELECT new_id,
         max(n_agree * 1000000000000 + (999999999999 - other_id)) AS packed
  FROM agree GROUP BY new_id
)
SELECT nd.doc_id AS new_id,
       999999999999 - (best.packed % 1000000000000) AS match_id,
       best.packed // 1000000000000 AS n_agree,
       CAST(best.packed // 1000000000000 AS DOUBLE) / {_INC_NUM_HASHES} AS est_jaccard,
       coalesce(best.packed // 1000000000000 >= {_INC_MIN_AGREE}, FALSE) AS is_dup
FROM newdoc nd LEFT JOIN best ON best.new_id = nd.doc_id
""",
)
def q94_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup: a 10% hash-gated slice of the corpus
    plays the daily batch; the rest plays the persisted signature index
    (operators/dedup.minhash_index — one (doc, band) row carrying the
    12-long minhash signature, NO raw text). The batch's band rows join
    the index (plus the batch itself) on the LSH bucket key, candidates
    are scored by signature agreement, and a packed-integer argmax keeps
    the best match per new doc — multi-band duplicates collapse in the
    agg, so there is no pair-distinct exchange. At 100 TB yesterday's
    corpus is never re-read: the index is ~100 bytes/doc. Output: one
    row per batch doc with its best match, agreement count, estimated
    Jaccard, and the dup verdict (NULLs when nothing collided)."""
    docs = load_table(spark, sf_dir, "documents")
    is_new = seeded_hash64(F.col("doc_id").cast("string"), "batch") % 10 == 0
    full_index = _dedup.minhash_index(
        docs,
        num_hashes=_INC_NUM_HASHES,
        rows_per_band=_INC_ROWS_PER_BAND,
        shingle_n=_INC_SHINGLE_N,
    )
    # one signature build, split by role (a real deployment reads the
    # index from parquet and builds signatures only for the new batch)
    index = full_index.filter(~is_new)
    new_index = full_index.filter(is_new)
    return _dedup.incremental_near_duplicates(
        index,
        new_index,
        num_hashes=_INC_NUM_HASHES,
        min_agree=_INC_MIN_AGREE,
    )


# --- PageRank over the purchase graph ----------------------------------------

from openstack_billing_from_db_spark.operators.graph import (
    PR_BASE,
    PR_INIT,
    pagerank_micro,
)

_PR_ITER = 3


def _pr_iteration_sql(k: int) -> str:
    return f"""
p{k} AS (SELECT n.node, CAST({PR_BASE} + (coalesce(s.t, 0) * 17) // 20 AS BIGINT) AS pr
         FROM nodes n LEFT JOIN (
           SELECT e.dst, sum(p.pr // d.outdeg) AS t
           FROM e JOIN p{k - 1} p ON p.node = e.src JOIN deg d ON d.src = e.src
           GROUP BY e.dst) s ON s.dst = n.node)"""


@register(
    "q95_pagerank",
    oracle=f"""
WITH eb AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                  's' || CAST(l_suppkey AS VARCHAR) AS b
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
e AS (SELECT a AS src, b AS dst FROM eb UNION ALL SELECT b, a FROM eb),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
p0 AS (SELECT node, CAST({PR_INIT} AS BIGINT) AS pr FROM nodes),
{",".join(_pr_iteration_sql(k) for k in range(1, _PR_ITER + 1))}
SELECT node, pr FROM p{_PR_ITER}
""",
)
def q95_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected customer↔supplier purchase graph
    (edges = distinct (customer, supplier) pairs through orders ⨝
    lineitem), {_PR_ITER} exact integer-micro iterations
    (operators/graph.pagerank_micro). The iterative-algorithm family
    member beside connected components: per iteration one |E| join +
    one partial-aggregated shuffle, lineage cut per round. The oracle
    replays the same fixed-point arithmetic as chained CTEs, so a
    single mis-floored share or damping step hash-fails."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # iterate on packed BIGINT node ids (customer 2k, supplier 2k+1):
    # the rank fixpoint depends only on graph structure, so any
    # bijective relabeling yields identical ranks — and every
    # per-iteration join/aggregation then shuffles 8-byte longs instead
    # of 'c<id>'/'s<id>' strings. The oracle's string ids are rendered
    # once at the end.
    eb = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    # symmetrize reading the join+distinct upstream ONCE (union of two
    # selects would evaluate it twice inside one cache-fill job — the
    # same trick connected_components uses)
    edges = eb.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    pr = pagerank_micro(edges, iterations=_PR_ITER)
    return pr.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c"), F.expr("node div 2").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("s"), F.expr("(node - 1) div 2").cast("string"))
        )
        .alias("node"),
        "pr",
    )


# --- MERGE / SCD2 lakehouse maintenance as registry entries -------------------

from datetime import datetime as _dt

from openstack_billing_from_db_spark.operators.merge import (
    merge_upsert,
    scd2_apply,
)

_SCD_HASH = seeded_hash64_sql("CAST(c_custkey AS VARCHAR)", "scd")
_T0 = "TIMESTAMP '2024-01-01 00:00:00'"
_TEFF = "TIMESTAMP '2024-06-01 00:00:00'"


def _customer_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # integer cents: md5-change-hash over a string-cast DOUBLE is not
    # engine-portable (Java vs DuckDB float formatting); BIGINT is
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("bal_cents"),
    )


@register(
    "q96_scd2_history",
    oracle=f"""
WITH base AS (
  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents FROM customer
),
chg AS (SELECT c_custkey FROM base WHERE {_SCD_HASH} % 5 = 0)
SELECT c_custkey, bal_cents, {_T0} AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to
FROM base WHERE c_custkey NOT IN (SELECT c_custkey FROM chg)
UNION ALL
SELECT c_custkey, bal_cents, {_T0}, {_TEFF}
FROM base WHERE c_custkey IN (SELECT c_custkey FROM chg)
UNION ALL
SELECT c_custkey, bal_cents + 10000, {_TEFF}, CAST(NULL AS TIMESTAMP)
FROM base WHERE c_custkey IN (SELECT c_custkey FROM chg)
""",
)
def q96_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 type-2 history maintenance (operators/merge.scd2_apply) put
    under the oracle: day-0 history opens every customer at t0; a new
    snapshot changes a 20% hash-gated slice's balance; the operator must
    close exactly the changed rows at the effective date and open their
    replacements — the oracle states the expected history in closed
    form, so a wrong change-detection or close/open step hash-fails.
    Shape at scale: one full-outer key join + three unions, the
    standard MERGE-emulation cost (Delta/Iceberg jars absent here)."""
    base = _customer_cents(spark, sf_dir)
    t0 = _dt(2024, 1, 1)
    history0 = base.select(
        "c_custkey",
        "bal_cents",
        F.lit(t0).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    is_chg = seeded_hash64(F.col("c_custkey").cast("string"), "scd") % 5 == 0
    snapshot = base.withColumn(
        "bal_cents",
        F.when(is_chg, F.col("bal_cents") + 10000).otherwise(F.col("bal_cents")),
    ).select(
        "c_custkey",
        "bal_cents",
        F.lit(t0).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    return scd2_apply(
        history0,
        snapshot,
        key=["c_custkey"],
        compare_cols=["bal_cents"],
        effective=_dt(2024, 6, 1),
    )


@register(
    "q97_merge_upsert",
    oracle=f"""
WITH base AS (
  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents FROM customer
),
upd AS (
  SELECT c_custkey, bal_cents + 5000 AS bal_cents
  FROM base WHERE {_SCD_HASH} % 4 = 0
  UNION ALL
  SELECT c_custkey + 1000000, CAST(777 AS BIGINT)
  FROM base WHERE {_SCD_HASH} % 10 = 0
)
SELECT c_custkey, bal_cents FROM upd
UNION ALL
SELECT c_custkey, bal_cents FROM base
WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
""",
)
def q97_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert (operators/merge.merge_upsert): a 25%
    hash-gated update slice plus synthetic brand-new keys; updates win,
    unmatched target rows survive. The oracle is the closed-form next
    snapshot. One key-partitioned anti-join — both sides hash once."""
    base = _customer_cents(spark, sf_dir)
    h = seeded_hash64(F.col("c_custkey").cast("string"), "scd")
    upd = (
        base.filter(h % 4 == 0)
        .select("c_custkey", (F.col("bal_cents") + 5000).alias("bal_cents"))
        .unionByName(
            base.filter(h % 10 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit(777).cast("long").alias("bal_cents"),
            )
        )
    )
    return merge_upsert(base, upd, key=["c_custkey"])


# --- streaming text admission, driver-certified (round 11, session 2) ----------
#
# q153/q158 put the video and fingerprint admission cores under the
# driver; this entry certifies the TEXT path — streaming/dedup_stream.
# admit_batch, whose kernel differs from both (minhash signature
# agreement with a packed best-match argmax, est_jaccard scoring, and
# blocking on the single BEST match only): a two-epoch replay
# (parity-split batches, epoch 2 probing epoch 1's admitted band rows)
# vs a closed-form oracle built on q94's signature CTE block.


def _text_admission_oracle() -> str:
    pk = _dedup._MATCH_PACK
    cand = """
  SELECT nb.doc_id AS new_id, ob.doc_id AS other_id
  FROM bands nb
  JOIN bands ob ON nb.band = ob.band AND nb.sig = ob.sig
              AND ob.doc_id != nb.doc_id
  JOIN {nb_set} x ON x.doc_id = nb.doc_id
  {other_filter}
  GROUP BY 1, 2
"""
    agree = """
  SELECT c.new_id, c.other_id, count(*) FILTER (WHERE a.mh = b.mh) AS n_agree
  FROM {c} c
  JOIN mh a ON a.doc_id = c.new_id
  JOIN mh b ON b.doc_id = c.other_id AND b.j = a.j
  GROUP BY c.new_id, c.other_id
"""
    best = (
        "SELECT new_id, max(n_agree * {pk} + ({pk1} - other_id)) AS packed "
        "FROM {a} GROUP BY new_id"
    )
    verdict = """
  SELECT d.doc_id AS new_id,
         {pk1} - (b.packed % {pk}) AS match_id,
         b.packed // {pk} AS n_agree,
         coalesce(b.packed // {pk} >= {min_agree}, FALSE) AS is_dup
  FROM {batch} d LEFT JOIN {best} b ON b.new_id = d.doc_id
"""
    return f"""
WITH {_INC_SIG_CTES},
docsh AS (SELECT DISTINCT doc_id FROM sh),
b1 AS (SELECT doc_id FROM docsh WHERE doc_id % 2 = 0),
b2 AS (SELECT doc_id FROM docsh WHERE doc_id % 2 = 1),
c1 AS ({cand.format(nb_set="b1", other_filter="JOIN b1 y ON y.doc_id = ob.doc_id")}),
a1 AS ({agree.format(c="c1")}),
best1 AS ({best.format(pk=pk, pk1=pk - 1, a="a1")}),
v1 AS ({verdict.format(pk=pk, pk1=pk - 1, min_agree=_INC_MIN_AGREE, batch="b1", best="best1")}),
adm1 AS (
  SELECT *, (NOT is_dup) OR (new_id < match_id) AS admitted FROM v1
),
idx1 AS (SELECT new_id AS doc_id FROM adm1 WHERE admitted),
c2 AS ({cand.format(nb_set="b2",
  other_filter="WHERE ob.doc_id IN (SELECT doc_id FROM idx1) OR ob.doc_id IN (SELECT doc_id FROM b2)")}),
a2 AS ({agree.format(c="c2")}),
best2 AS ({best.format(pk=pk, pk1=pk - 1, a="a2")}),
v2 AS ({verdict.format(pk=pk, pk1=pk - 1, min_agree=_INC_MIN_AGREE, batch="b2", best="best2")}),
adm2 AS (
  SELECT v.*,
         (NOT v.is_dup)
         OR (y.doc_id IS NOT NULL AND v.new_id < v.match_id) AS admitted
  FROM v2 v LEFT JOIN b2 y ON y.doc_id = v.match_id
)
SELECT new_id AS doc_id, CAST(0 AS BIGINT) AS epoch,
       CAST(match_id AS BIGINT) AS match_id,
       CAST(n_agree AS BIGINT) AS n_agree,
       CAST(n_agree AS DOUBLE) / {_INC_NUM_HASHES} AS est_jaccard,
       is_dup, admitted
FROM adm1
UNION ALL
SELECT new_id, CAST(1 AS BIGINT), CAST(match_id AS BIGINT),
       CAST(n_agree AS BIGINT), CAST(n_agree AS DOUBLE) / {_INC_NUM_HASHES},
       is_dup, admitted
FROM adm2
"""


@register(
    "q159_streaming_text_admission", oracle=_text_admission_oracle()
)
def q159_streaming_text_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch streaming TEXT admission through the real
    streaming/dedup_stream.admit_batch composition — the minhash
    signature-index kernel (q94's probe) under its admission/blocking
    rule, driver-certified like the video (q153) and audio (q158)
    paths: even-id docs arrive in epoch 1 against an empty index, their
    admitted band rows become the index, odd-id docs arrive in epoch 2
    and are blocked when their BEST match (packed argmax over signature
    agreement — ties to the lowest id) is a dup verdict, unless that
    match is a higher-id batch peer (min-id canonical). Per-epoch work
    is (batch band rows) × (index bucket occupancy); raw text never
    enters the index (~100 B/doc band rows). Output: one verdict row
    per doc (doc_id, epoch, match_id, n_agree, est_jaccard, is_dup,
    admitted)."""
    from openstack_billing_from_db_spark.streaming.dedup_stream import (
        admit_batch,
    )

    docs = load_table(spark, sf_dir, "documents")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    empty = spark.createDataFrame(
        [], "doc_id long, sig array<bigint>, band long, band_sig string"
    )
    v1, add1 = admit_batch(
        spark,
        b1,
        None,
        num_hashes=_INC_NUM_HASHES,
        rows_per_band=_INC_ROWS_PER_BAND,
        shingle_n=_INC_SHINGLE_N,
        min_agree=_INC_MIN_AGREE,
        existing_index=empty,
    )
    v2, _ = admit_batch(
        spark,
        b2,
        None,
        num_hashes=_INC_NUM_HASHES,
        rows_per_band=_INC_ROWS_PER_BAND,
        shingle_n=_INC_SHINGLE_N,
        min_agree=_INC_MIN_AGREE,
        existing_index=add1,
    )

    def with_epoch(v: DataFrame, e: int) -> DataFrame:
        return v.select(
            F.col("new_id").alias("doc_id"),
            F.lit(e).cast("long").alias("epoch"),
            F.col("match_id").cast("long").alias("match_id"),
            F.col("n_agree").cast("long").alias("n_agree"),
            "est_jaccard",
            "is_dup",
            "admitted",
        )

    return with_epoch(v1, 0).unionByName(with_epoch(v2, 1))
