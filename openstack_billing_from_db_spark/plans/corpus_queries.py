"""Round-2 corpus-pipeline registry entries: eval-set decontamination,
PII/noise scrubbing, stratified sampling, log-free BM25-style retrieval,
and token-budget sequence packing — the remaining operations a
large-scale training-data pipeline runs between raw corpus and training
batches. Each is a (Spark plan, DuckDB oracle) pair like every other
registry entry; all math is engine-portable (integer/hash/decimal or
single-deterministic-double-op — see registry.py header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.functions.hashing import (
    seeded_hash64,
    seeded_hash64_sql,
)
from openstack_billing_from_db_spark.operators import curation, sampling, text
from openstack_billing_from_db_spark.registry import register
from openstack_billing_from_db_spark.sources.tables import load_table

# DuckDB twin of operators/text.py words()
_W = "list_filter(string_split(trim(text), ' '), w -> w != '')"


# --- eval-set decontamination ------------------------------------------------

_DECON_N = 4  # n-gram width
_EVAL_HASH = seeded_hash64_sql("CAST(doc_id AS VARCHAR)", "eval")


@register(
    "q68_decontamination",
    oracle=f"""
WITH wrd AS (SELECT doc_id, {_W} AS w FROM documents),
g AS (
  SELECT DISTINCT doc_id, {seeded_hash64_sql("ng", "ng")} AS gh
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - {_DECON_N - 2}),
                                 i -> array_to_string(w[i:i+{_DECON_N - 1}], ' '))) AS ng
    FROM wrd WHERE len(w) >= {_DECON_N}
  )
),
ev AS (SELECT doc_id AS eval_id, gh FROM g WHERE {_EVAL_HASH} % 20 = 0),
tr AS (SELECT doc_id AS train_id, gh FROM g WHERE {_EVAL_HASH} % 20 != 0)
SELECT t.train_id, e.eval_id, CAST(count(*) AS BIGINT) AS shared_ngrams
FROM tr t JOIN ev e ON t.gh = e.gh
GROUP BY t.train_id, e.eval_id
""",
)
def q68_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: count distinct n-grams each training
    document shares with each held-out eval document (eval membership is
    the q66-style seeded hash, 5% of the corpus). The join key is a
    64-bit portable hash of the n-gram, NOT the n-gram string — the
    shuffle carries narrow (doc_id, int64) rows whatever the document
    length, which is what survives at 100 TB. Both engines hash
    identically, so the oracle is exact (md5 collisions aside, which
    would have to collide identically in both engines anyway)."""
    from openstack_billing_from_db_spark.operators.parallelism import (
        ensure_map_parallelism,
    )

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
    ev = grams.filter(is_eval).select(F.col("doc_id").alias("eval_id"), "gh")
    tr = grams.filter(~is_eval).select(F.col("doc_id").alias("train_id"), "gh")
    return tr.join(ev, "gh").groupBy("train_id", "eval_id").agg(
        F.count(F.lit(1)).alias("shared_ngrams")
    )


# --- PII / noise scrubbing ---------------------------------------------------

# conservative patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB)
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[A-Za-z0-9./?=&_-]+"
_NUM_RE = r"[0-9]+"

# deterministic noise injected from doc_id via identical concat in both
# engines: the corpus text itself contains no emails/URLs/digits, so the
# scrub is exercised on realistic planted PII rather than vacuous zeros.
_NOISY_SQL = (
    "concat(text, ' contact user', CAST(doc_id AS VARCHAR), "
    "'@example.com or https://ex', CAST(doc_id AS VARCHAR), "
    "'.org/a?b=1 ref ', CAST(doc_id * 7919 AS VARCHAR))"
)


@register(
    "q69_text_scrub",
    oracle=f"""
WITH noisy AS (SELECT doc_id, {_NOISY_SQL} AS t FROM documents),
c1 AS (SELECT doc_id, t, regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t1 FROM noisy),
c2 AS (SELECT doc_id, t, t1, regexp_replace(t1, '{_URL_RE}', '<URL>', 'g') AS t2 FROM c1)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{_URL_RE}')) AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(t2, '{_NUM_RE}')) AS BIGINT) AS n_nums,
       CAST(length(regexp_replace(t2, '{_NUM_RE}', '<NUM>', 'g')) AS BIGINT) AS clean_len,
       md5(regexp_replace(t2, '{_NUM_RE}', '<NUM>', 'g')) AS clean_md5
FROM c2
""",
)
def q69_text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/noise scrubbing — the standard pre-training cleaning pass
    (emails → <EMAIL>, URLs → <URL>, digit runs → <NUM>), applied in a
    fixed order so counts are well-defined (emails are scrubbed before
    the URL pass, URLs before the digit pass). Pure map-side
    regexp_replace chain, whole-stage codegen, zero shuffle; the
    cleaned-text md5 makes the oracle sensitive to any cross-engine
    regex-semantics drift, not just the counts."""
    docs = load_table(spark, sf_dir, "documents")
    noisy = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or https://ex"),
        F.col("doc_id").cast("string"),
        F.lit(".org/a?b=1 ref "),
        (F.col("doc_id") * 7919).cast("string"),
    )
    base = docs.select("doc_id", noisy.alias("t"))
    t1 = F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>")
    base = base.withColumn("t1", t1)
    t2 = F.regexp_replace(F.col("t1"), _URL_RE, "<URL>")
    base = base.withColumn("t2", t2)
    clean = F.regexp_replace(F.col("t2"), _NUM_RE, "<NUM>")
    return base.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("t1"), F.lit(_URL_RE)).cast("long").alias("n_urls"),
        F.regexp_count(F.col("t2"), F.lit(_NUM_RE)).cast("long").alias("n_nums"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


# --- stratified sampling -----------------------------------------------------

# per-language corpus quotas (pct): upsample high-resource strata less
_SAMPLE_RATES = {"en": 50, "de": 25, "es": 25, "fr": 10, "zh": 10}

_SAMPLE_HASH = seeded_hash64_sql("CAST(doc_id AS VARCHAR)", "sample")
_RATE_CASE = "CASE " + " ".join(
    f"WHEN lang = '{s}' THEN {p}" for s, p in sorted(_SAMPLE_RATES.items())
) + " ELSE 0 END"


@register(
    "q70_stratified_sample",
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE {_SAMPLE_HASH} % 100 < {_RATE_CASE}
""",
)
def q70_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sample (en 50%, de/es 25%,
    fr/zh 10%): membership is a seeded portable hash of doc_id against a
    per-stratum quota — reproducible on any engine/cluster layout and
    monotone across rate configs (operators/sampling.py). Map-side
    filter, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.stratified_hash_sample(
        docs,
        id_col="doc_id",
        strata_col="lang",
        rates=_SAMPLE_RATES,
        seed="sample",
    ).select("doc_id", "lang")


# --- BM25-style lexical retrieval --------------------------------------------

_BM25_TERMS = ("spark", "window", "merge")
# e0 notation: DuckDB types bare decimal-point literals as DECIMAL, whose
# double conversion differs from an IEEE double literal in the last ulp;
# scientific notation forces DOUBLE and restores bit-exact parity
_BM25_K1 = "1.2e0"
_BM25_B_DL = "0.25e0 + 0.75e0 * (dl / avgdl)"  # (1-b) + b*dl/avgdl, b=0.75
_BM25_TOPK = 20


def _bm25_term_sql(t: str) -> str:
    # identical expression tree to the Spark side: every op is a single
    # deterministic IEEE double op (no log, no multi-term double sums)
    return (
        f"(((n - df_{t}) + 0.5e0) / (df_{t} + 0.5e0))"
        f" * ((tf_{t} * 2.2e0) / (tf_{t} + {_BM25_K1} * ({_BM25_B_DL})))"
    )


@register(
    "q71_bm25_topk",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         {', '.join(f"len(list_filter({_W}, x -> x = '{t}')) AS tf_{t}" for t in _BM25_TERMS)},
         len({_W}) AS dl
  FROM documents
),
stats AS (
  SELECT count(*) AS n,
         CAST(CAST(sum(dl) AS DECIMAL(38,0)) AS DOUBLE) / count(*) AS avgdl,
         {', '.join(f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in _BM25_TERMS)}
  FROM base
),
scored AS (
  SELECT doc_id,
         ({_bm25_term_sql(_BM25_TERMS[0])} + {_bm25_term_sql(_BM25_TERMS[1])})
           + {_bm25_term_sql(_BM25_TERMS[2])} AS score
  FROM base CROSS JOIN stats
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
FROM scored
ORDER BY score DESC, doc_id
LIMIT {_BM25_TOPK}
""",
)
def q71_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-style lexical top-k for a fixed term set — the retrieval
    primitive behind quality-targeted corpus selection. The idf uses the
    rational core of BM25's idf, (N − df + ½)/(df + ½), WITHOUT the log:
    ln is the one libm call whose last-ulp behaviour differs across
    engines, and since log is monotone the top-k ranking is
    log-invariant for single-term queries and near-identical for short
    conjunctions (production would wrap ln around the same column).
    Everything else is BM25 verbatim (k1=1.2, b=0.75, length
    normalization by dl/avgdl). Plan shape: one map pass for tf/dl, a
    1-row global aggregate broadcast back, and TakeOrderedAndProject for
    the top-k — no shuffle proportional to the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    w = text.words(F.col("text"))

    def tf(term: str):
        # single-parameter lambda: a second parameter would make pyspark
        # bind the array INDEX to it (higher-order-function arity rule)
        return F.size(F.filter(w, lambda x: x == F.lit(term)))

    base = docs.select(
        "doc_id",
        *[tf(t).alias(f"tf_{t}") for t in _BM25_TERMS],
        F.size(w).alias("dl"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("dl").cast("decimal(38,0)").cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )

    def term_score(t: str):
        idf = ((F.col("n") - F.col(f"df_{t}")) + F.lit(0.5)) / (
            F.col(f"df_{t}") + F.lit(0.5)
        )
        norm = F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.col("avgdl"))
        sat = (F.col(f"tf_{t}") * F.lit(2.2)) / (
            F.col(f"tf_{t}") + F.lit(1.2) * norm
        )
        return idf * sat

    scored = base.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        (
            (term_score(_BM25_TERMS[0]) + term_score(_BM25_TERMS[1]))
            + term_score(_BM25_TERMS[2])
        ).alias("score"),
    )
    from pyspark.sql.window import Window

    # limit FIRST (TakeOrderedAndProject — no global sort materializes),
    # then rank within the k survivors; identical to ranking-then-limiting
    # because row_number follows the same (score DESC, doc_id) order
    topk = scored.orderBy(F.col("score").desc(), "doc_id").limit(_BM25_TOPK)
    return topk.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
        .cast("long"),
    )


# --- token-budget sequence packing -------------------------------------------

_PACK_BUDGET = 2048
_PACK_SHARDS = 8
_SHARD_HASH = seeded_hash64_sql("CAST(doc_id AS VARCHAR)", "shard")


@register(
    "q72_sequence_pack",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_SHARD_HASH} % {_PACK_SHARDS} AS shard, len({_W}) AS n_tokens
  FROM documents
),
cum AS (
  SELECT shard, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM toks
)
SELECT shard, CAST((cum_tokens - 1) // {_PACK_BUDGET} AS BIGINT) AS chunk,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
       min(doc_id) AS first_doc_id
FROM cum
GROUP BY shard, CAST((cum_tokens - 1) // {_PACK_BUDGET} AS BIGINT)
""",
)
def q72_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing — exactly how GPT-style
    pretraining consumes documents: within a shard, documents are laid
    end-to-end in doc_id order and the token stream is cut every
    ``budget`` (2048) tokens; a document belongs to the chunk its last
    token lands in. Sharding bounds the window-sort partition (the 100 TB
    layout: hundreds of shards, each a bounded cumulative sum) and the
    deterministic hash shard assignment reproduces on any engine. One
    hash exchange (by shard) total."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (seeded_hash64(F.col("doc_id").cast("string"), "shard") % _PACK_SHARDS).alias(
            "shard"
        ),
        F.size(text.words(F.col("text"))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    chunk = F.expr(f"(cum_tokens - 1) div {_PACK_BUDGET}")
    return (
        cum.withColumn("chunk", chunk)
        .groupBy("shard", "chunk")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("chunk_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


# --- hybrid retrieval: RRF fusion of BM25 + vector top-k (round 6) -----------

_RRF_K0 = 60
_RRF_TOPK = 10
_RRF_LIST_K = 20  # depth of each input ranking


def _rrf_oracle() -> str:
    """The q71 BM25 chain (same constants, ranked to _RRF_LIST_K) and
    the q38 single-query cosine chain (query vec_id < 1), fused by
    integer-micro reciprocal rank — no doubles past the retrievers."""
    lex_terms = (
        f"({_bm25_term_sql(_BM25_TERMS[0])} + {_bm25_term_sql(_BM25_TERMS[1])})"
        f" + {_bm25_term_sql(_BM25_TERMS[2])}"
    )
    return f"""
WITH base AS (
  SELECT doc_id,
         {', '.join(f"len(list_filter({_W}, x -> x = '{t}')) AS tf_{t}" for t in _BM25_TERMS)},
         len({_W}) AS dl
  FROM documents
),
stats AS (
  SELECT count(*) AS n,
         CAST(CAST(sum(dl) AS DECIMAL(38,0)) AS DOUBLE) / count(*) AS avgdl,
         {', '.join(f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in _BM25_TERMS)}
  FROM base
),
lscored AS (
  SELECT doc_id, {lex_terms} AS score FROM base CROSS JOIN stats
),
lex AS (
  SELECT doc_id, lrank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lrank
    FROM lscored
  ) WHERE lrank <= {_RRF_LIST_K}
),
corpus AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS e,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS e_norm
  FROM embeddings
),
vq AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS q_norm
  FROM embeddings WHERE vec_id < 1
),
vscored AS (
  SELECT neighbor_id, list_inner_product(e, q) / (e_norm * q_norm) AS cos
  FROM corpus, vq WHERE neighbor_id != query_id
),
vec AS (
  SELECT doc_id, vrank FROM (
    SELECT neighbor_id AS doc_id,
           row_number() OVER (ORDER BY cos DESC, neighbor_id) AS vrank
    FROM vscored
  ) WHERE vrank <= {_RRF_LIST_K}
),
fused AS (
  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         coalesce(1000000 // ({_RRF_K0} + l.lrank), 0)
           + coalesce(1000000 // ({_RRF_K0} + v.vrank), 0) AS rrf_micro
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
)
SELECT doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro, rank FROM (
  SELECT doc_id, rrf_micro,
         CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS BIGINT)
           AS rank
  FROM fused
) WHERE rank <= {_RRF_TOPK}"""


@register("q132_hybrid_rrf", oracle=_rrf_oracle())
def q132_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion
    (operators/similarity.rrf_fuse; Cormack et al. 2009): the q71 BM25
    lexical ranking and the q38 exact-cosine vector ranking (query =
    doc 0's embedding — documents and embeddings share an id space),
    each to depth {_RRF_LIST_K}, fused score-free by
    Σ 1000000 div ({_RRF_K0} + rank) — BM25 scores and cosines are not
    commensurable, ranks are, and integer micro-contributions make the
    fused scores and tie order engine-exact. The full-outer fusion join
    runs over two {_RRF_LIST_K}-row lists; the heavy lifting stays in
    the retrievers (1-row-broadcast BM25 stats, broadcast query
    vector), so fusion adds nothing corpus-sized."""
    from openstack_billing_from_db_spark.operators.similarity import (
        brute_force_topk,
        rrf_fuse,
    )

    # q71's registered body IS the lexical retriever at depth
    # _BM25_TOPK == _RRF_LIST_K (asserted so a depth drift fails loudly)
    assert _BM25_TOPK == _RRF_LIST_K
    lex = q71_bm25_topk(spark, sf_dir).select("doc_id", "rank")
    vec = brute_force_topk(
        load_table(spark, sf_dir, "embeddings"), n_queries=1, k=_RRF_LIST_K
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rn").alias("rank"))
    return rrf_fuse(
        [lex, vec],
        id_col="doc_id",
        rank_col="rank",
        k0=_RRF_K0,
        topk=_RRF_TOPK,
    )


# --- greedy (whole-document) sequence packing — round 10 ----------------------

# Smaller budget than q72's 2048 so the greedy rule is exercised every
# few documents at test scale (sf0.01 documents average ~60 tokens).
# Shard count is derived from the certified fixture ceiling via the
# tuner (q144/q145's pattern: plan and f-string oracle consume the same
# derived constant, so a tuner re-anchor re-derives both together);
# derived value today: 8.
_GPACK_BUDGET = 256
_GPACK_FIXTURE_MAX_DOCS = 100_000
_GPACK_SHARDS = curation.tune_pack_shards(_GPACK_FIXTURE_MAX_DOCS)


def _gpack_ctes() -> str:
    """Shared recursive greedy-packing CTE chain (toks → seq → packed):
    q148 certifies the rule and q150's 'greedy' baseline must replay the
    IDENTICAL rule, so both oracles consume this one string (the repo's
    _minhash_jaccard_blocks pattern — a rule edit cannot silently
    desynchronize the two)."""
    return f"""toks AS (
  SELECT doc_id, {_GPACK_HASH} % {_GPACK_SHARDS} AS shard, len({_W}) AS n_tokens
  FROM documents
),
seq AS (
  SELECT shard, doc_id, n_tokens,
         row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM toks
),
packed AS (
  SELECT shard, doc_id, n_tokens, rn, CAST(0 AS BIGINT) AS bin, n_tokens AS acc
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.shard, s.doc_id, s.n_tokens, s.rn,
         CASE WHEN p.acc + s.n_tokens > {_GPACK_BUDGET} THEN p.bin + 1 ELSE p.bin END,
         CASE WHEN p.acc + s.n_tokens > {_GPACK_BUDGET} THEN s.n_tokens
              ELSE p.acc + s.n_tokens END
  FROM packed p JOIN seq s ON s.shard = p.shard AND s.rn = p.rn + 1
)"""
_GPACK_HASH = seeded_hash64_sql("CAST(doc_id AS VARCHAR)", "gpack")


@register(
    "q148_greedy_sequence_pack",
    oracle=f"""
WITH RECURSIVE {_gpack_ctes()}
SELECT shard, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, bin
FROM packed
""",
)
def q148_greedy_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit-sequential packing: within a hash shard, in
    doc_id order, a document that would push the open training sequence
    past the token budget closes it and opens the next — documents are
    never split, unlike q72's concat-and-chunk cut. This is the packing
    shape SFT / instruction-tuning uses (whole examples per sequence).

    The rule is inherently sequential, so the Spark side is the
    sanctioned per-shard ``applyInPandas`` stateful kernel over narrow
    (shard, doc_id, n_tokens) rows (operators/curation.greedy_pack_bins)
    — text never enters the Arrow stage; parallelism = shards, exactly
    q72's distribution contract. The DuckDB twin replays the same rule
    as a recursive CTE stepping one row per shard per iteration — a
    deliberately engine-idiomatic re-expression on each side."""
    from openstack_billing_from_db_spark.operators.curation import greedy_pack_bins

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (seeded_hash64(F.col("doc_id").cast("string"), "gpack") % _GPACK_SHARDS).alias(
            "shard"
        ),
        F.size(text.words(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return greedy_pack_bins(toks, budget=_GPACK_BUDGET).select(
        "shard", "doc_id", "n_tokens", "bin"
    )


# --- length-bucketed batching — round 10 --------------------------------------

# Fixed token-length bucket width + sequences per batch: width-based
# buckets are shuffle-bounded (partition key = bucket) and need no
# global sort/ntile, which is what survives at 100 TB; padding waste is
# the batch's max length times its row count minus its token sum.
_LB_WIDTH = 16
_LB_BATCH = 8


@register(
    "q149_length_bucketed_batches",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, len({_W}) AS n_tokens FROM documents
),
b AS (
  SELECT doc_id, n_tokens, n_tokens // {_LB_WIDTH} AS bucket,
         row_number() OVER (PARTITION BY n_tokens // {_LB_WIDTH}
                            ORDER BY n_tokens, doc_id) AS rn
  FROM toks
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST((rn - 1) // {_LB_BATCH} AS BIGINT) AS batch,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(n_tokens) AS BIGINT) AS batch_max_tokens,
       CAST(sum(n_tokens) AS BIGINT) AS batch_tokens,
       CAST(max(n_tokens) * count(*) - sum(n_tokens) AS BIGINT) AS padding_waste
FROM b
GROUP BY 1, 2
""",
)
def q149_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching: documents fall into fixed token-length
    buckets (``n_tokens div 16``), are ordered (n_tokens, doc_id) inside
    the bucket, and every 8 consecutive sequences form a training batch;
    the output reports each batch's padding waste (pad-to-max cost).
    This is the dynamic-batching prep that cuts padding FLOPs for
    variable-length finetuning.

    Scale shape: width-based buckets need NO global sort or ntile — one
    hash exchange on the bucket key, a bounded per-bucket window, and a
    partial-aggregable groupBy. All JVM-side; long arithmetic only, so
    the oracle is bit-exact."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(text.words(F.col("text"))).cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("bucket").orderBy("n_tokens", "doc_id")
    b = (
        toks.withColumn("bucket", F.expr(f"n_tokens div {_LB_WIDTH}"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("batch", F.expr(f"(rn - 1) div {_LB_BATCH}").cast("long"))
    )
    return b.groupBy("bucket", "batch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tokens").alias("batch_max_tokens"),
        F.sum("n_tokens").alias("batch_tokens"),
        (F.max("n_tokens") * F.count(F.lit(1)) - F.sum("n_tokens")).alias(
            "padding_waste"
        ),
    )


@register(
    "q150_packing_efficiency",
    oracle=f"""
WITH RECURSIVE {_gpack_ctes()},
g_shard AS (
  SELECT shard, max(bin) + 1 AS n_bins, sum(n_tokens) AS tok FROM packed GROUP BY shard
),
greedy AS (
  SELECT 'greedy' AS strategy,
         CAST(sum(n_bins) AS BIGINT) AS n_bins,
         CAST(sum(tok) AS BIGINT) AS total_tokens,
         CAST(0 AS BIGINT) AS n_docs_split
  FROM g_shard
),
cum AS (
  SELECT shard, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM toks
),
c_shard AS (
  SELECT shard, sum(n_tokens) AS tok,
         sum(CASE WHEN n_tokens > 0
                  AND (c - n_tokens) // {_GPACK_BUDGET} != (c - 1) // {_GPACK_BUDGET}
                  THEN 1 ELSE 0 END) AS n_split
  FROM cum GROUP BY shard
),
chunk AS (
  SELECT 'chunk' AS strategy,
         CAST(sum((tok + {_GPACK_BUDGET} - 1) // {_GPACK_BUDGET}) AS BIGINT) AS n_bins,
         CAST(sum(tok) AS BIGINT) AS total_tokens,
         CAST(sum(n_split) AS BIGINT) AS n_docs_split
  FROM c_shard WHERE tok > 0
)
SELECT strategy, n_bins, total_tokens,
       CAST((total_tokens * 1000000) // (n_bins * {_GPACK_BUDGET}) AS BIGINT)
         AS fill_rate_micro,
       n_docs_split
FROM (SELECT * FROM greedy UNION ALL SELECT * FROM chunk)
""",
)
def q150_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-strategy evaluation loop (the q114/q116 pattern applied
    to the packing family): greedy whole-document packing (q148's
    kernel) vs concat-and-chunk (q72's rule) AT THE SAME budget and
    sharding — bins used, fill rate (micro-units of budget), and how
    many documents the chunk cut splits across sequence boundaries
    (greedy never splits by construction; chunk never wastes padding —
    fill 100% except the per-shard tail). This is the measurement that
    sizes the padding-vs-split tradeoff before committing a corpus to
    one packing layout.

    Scale shape: both sides reduce to per-shard aggregates (greedy via
    the q148 Arrow kernel, chunk via the q72 cumulative-sum window) —
    two 1-row-per-shard streams, constant-size output. All BIGINT; the
    fill rate is a single floor division."""
    from pyspark.sql.window import Window

    from openstack_billing_from_db_spark.operators.curation import greedy_pack_bins

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (seeded_hash64(F.col("doc_id").cast("string"), "gpack") % _GPACK_SHARDS).alias(
            "shard"
        ),
        F.size(text.words(F.col("text"))).cast("long").alias("n_tokens"),
    )
    g_shard = (
        greedy_pack_bins(toks, budget=_GPACK_BUDGET)
        .groupBy("shard")
        .agg(
            (F.max("bin") + F.lit(1)).alias("n_bins"),
            F.sum("n_tokens").alias("tok"),
        )
    )
    greedy = g_shard.agg(
        F.lit("greedy").alias("strategy"),
        F.sum("n_bins").cast("long").alias("n_bins"),
        F.sum("tok").cast("long").alias("total_tokens"),
        F.lit(0).cast("long").alias("n_docs_split"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("c", F.sum("n_tokens").over(w))
    split = F.when(
        (F.col("n_tokens") > 0)
        & (
            F.expr(f"(c - n_tokens) div {_GPACK_BUDGET}")
            != F.expr(f"(c - 1) div {_GPACK_BUDGET}")
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    c_shard = (
        cum.groupBy("shard")
        .agg(F.sum("n_tokens").alias("tok"), F.sum(split).alias("n_split"))
        .filter(F.col("tok") > 0)
    )
    chunk = c_shard.agg(
        F.lit("chunk").alias("strategy"),
        F.sum(
            F.expr(f"(tok + {_GPACK_BUDGET} - 1) div {_GPACK_BUDGET}")
        )
        .cast("long")
        .alias("n_bins"),
        F.sum("tok").cast("long").alias("total_tokens"),
        F.sum("n_split").cast("long").alias("n_docs_split"),
    )
    both = greedy.unionByName(chunk)
    return both.select(
        "strategy",
        "n_bins",
        "total_tokens",
        F.expr(f"(total_tokens * 1000000) div (n_bins * {_GPACK_BUDGET})")
        .cast("long")
        .alias("fill_rate_micro"),
        "n_docs_split",
    )


_GPACK_SPLIT = 250  # doc_id boundary between the two incremental phases


@register(
    "q151_incremental_greedy_pack",
    oracle=f"""
WITH RECURSIVE {_gpack_ctes()}
SELECT shard, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, bin
FROM packed
""",
)
def q151_incremental_greedy_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental greedy packing certified ≡ the batch rule: documents
    below doc_id {_GPACK_SPLIT} pack first, their shards-sized open-bin
    state (curation.pack_state) carries over, and the remainder packs
    as a continuation (curation.greedy_pack_continue — the q94-style
    incremental companion of q148's kernel, and the kernel behind
    streaming/pack_stream.run_streaming_greedy_pack). The oracle is
    q148's recursive CTE over ALL documents in one pass — the driver
    row certifies the continuation composes to exactly the batch
    answer, the property that lets an arriving corpus pack epoch by
    epoch without re-packing history."""
    from openstack_billing_from_db_spark.operators.curation import (
        greedy_pack_continue,
        merge_pack_state,
        pack_state,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (seeded_hash64(F.col("doc_id").cast("string"), "gpack") % _GPACK_SHARDS).alias(
            "shard"
        ),
        F.size(text.words(F.col("text"))).cast("long").alias("n_tokens"),
    )
    first = greedy_pack_continue(
        toks.filter(F.col("doc_id") < _GPACK_SPLIT), None, budget=_GPACK_BUDGET
    )
    state = merge_pack_state(None, pack_state(first))
    rest = greedy_pack_continue(
        toks.filter(F.col("doc_id") >= _GPACK_SPLIT), state, budget=_GPACK_BUDGET
    )
    return first.unionByName(rest).select("shard", "doc_id", "n_tokens", "bin")


# --- video scene-cut detection (round 11) --------------------------------------
#
# The shot-boundary member of the multimodal family: a training pipeline
# segments videos into scenes BEFORE sampling frames (one representative
# frame per scene beats stride sampling, which splits shots or misses
# short ones). The fixture (media.synth_scene_video_frames) gives every
# doc a real RVID clip of 12 frames in 3/4/5-frame scenes — or a single
# 12-frame scene for doc_id % 4 == 3, the no-cut edge — with a moving
# one-cell jitter INSIDE scenes so the threshold semantics are load-
# bearing (threshold 0 would over-segment every clip). All arithmetic is
# integer (pooled block sums, L1 deltas), so the oracle replays the
# texture, pooling, delta, cut, and running-scene-count chain exactly.

# mean per-cell gray-level delta that counts as a hard cut; the raw
# pooled-sum compare is threshold · grid² · pool_scale (= 8·64·12 for
# the 16×16 fixture), resolution-independent by construction
_SCENE_CUT_THRESHOLD = 8
_SCENE_FIXTURE_SCALE = 12  # 3 channels × 2×2 block on the 16×16 fixture


def _scene_cut_oracle() -> str:
    from openstack_billing_from_db_spark.functions.hashing import (
        portable_hash64_sql,
    )

    base = portable_hash64_sql(
        "concat('scene|', CAST(l.doc_id AS VARCHAR), ':', "
        "CAST(f.f // l.slen AS VARCHAR), ':', CAST(u.u AS VARCHAR), ':', "
        "CAST(r.r AS VARCHAR))"
    )
    return f"""
WITH L AS (
  SELECT doc_id,
         CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 4 WHEN 2 THEN 5
              ELSE 12 END AS slen
  FROM documents
),
cells AS MATERIALIZED (
  SELECT l.doc_id, f.f, r.r, u.u,
         12 * LEAST({base} % 256
                    + CASE WHEN r.r = f.f % 8 AND u.u = f.f % 8
                           THEN 1 ELSE 0 END, 255) AS v
  FROM L l, range(12) f(f), range(8) r(r), range(8) u(u)
),
d1 AS MATERIALIZED (
  SELECT a.doc_id, a.f, sum(abs(a.v - b.v)) AS delta
  FROM cells a JOIN cells b
    ON b.doc_id = a.doc_id AND b.f = a.f - 1
   AND b.r = a.r AND b.u = a.u
  GROUP BY a.doc_id, a.f
),
flags AS (
  SELECT c.doc_id, c.f,
         coalesce(CASE WHEN d1.delta >
                    {_SCENE_CUT_THRESHOLD * 64 * _SCENE_FIXTURE_SCALE}
                       THEN 1 ELSE 0 END, 0) AS cut
  FROM (SELECT DISTINCT doc_id, f FROM cells) c
  LEFT JOIN d1 ON d1.doc_id = c.doc_id AND d1.f = c.f
),
sc AS (
  SELECT doc_id, f,
         sum(cut) OVER (PARTITION BY doc_id ORDER BY f
                        ROWS UNBOUNDED PRECEDING) AS scene_idx
  FROM flags
)
SELECT doc_id, CAST(scene_idx AS BIGINT) AS scene_idx,
       CAST(min(f) AS BIGINT) AS start_frame,
       CAST(max(f) AS BIGINT) AS end_frame,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(min(f) AS BIGINT) AS rep_frame
FROM sc GROUP BY doc_id, scene_idx
"""


@register("q157_video_scene_cuts", oracle=_scene_cut_oracle())
def q157_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene segmentation (multimodal.video_scene_cuts): one real
    RVID decode per clip in the Arrow map stage → pooled integer
    intensity mesh per frame (the dhash_pixels block-sum pooling, exact
    BIGINT) → L1 delta between consecutive frames via a per-video lag
    window → cut where the MEAN per-cell delta exceeds
    {_SCENE_CUT_THRESHOLD} gray levels (the raw-sum compare is scaled
    by grid² · pool_scale, resolution-independent) → scene id as the
    running cut count → per-scene frame span + representative frame.
    The oracle replays texture synthesis, pooling, deltas, the
    threshold, and the running count in closed form — a codec, pooling,
    windowing, or threshold bug hash-fails. Scale shape: video bytes
    never shuffle (narrow (doc, frame, mesh) rows after the map stage);
    windows and aggregates are per-video, so state is bounded by
    frames-per-clip and clips parallelize freely."""
    from openstack_billing_from_db_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthesize_scene_video_payloads(docs)
    return multimodal.video_scene_cuts(
        payloads, cut_threshold=_SCENE_CUT_THRESHOLD
    ).select(
        "doc_id",
        "scene_idx",
        "start_frame",
        "end_frame",
        "n_frames",
        "rep_frame",
    )


# --- scene-level near-duplicate dedup (round 12) --------------------------------
#
# The composition scene segmentation exists for (VERDICT r11 Next #6):
# scenes → one representative frame per scene → perceptual-hash banded
# join over (video, scene) entities. One decode serves segmentation AND
# hashing (the rep-frame dHash packs JVM-side from the same pooled mesh
# — multimodal.mesh_dhash_column), and the banded join input is ~1/L of
# the all-frames alternative. The fixture
# (media.synth_family_scene_video_frames) adds the image-family rule to
# the q157 scene clips: families share scene textures with a one-cell
# member bump, so a family's scene-s rep frames sit at hamming <= 4
# (members' differing scene LENGTHS put their rep frames at different
# positions, so the moving jitter cell adds an occasional margin bit —
# replayed exactly by the oracle either way).

from openstack_billing_from_db_spark.operators.dedup import (  # noqa: E402
    tune_hamming_band_bits as _tune_hamming_band_bits,
)

# same import-time tuner derivation as the other perceptual plans
# (documents fixtures stay far below the 100k anchor through sf0.1)
_SRD_BAND_BITS = _tune_hamming_band_bits(100_000, bits=56, max_hamming=4)
_SRD_FACTOR = 1 << 20  # multimodal.SCENE_ENTITY_FACTOR


def _scene_rep_dedup_oracle() -> str:
    from openstack_billing_from_db_spark.functions.hashing import (
        portable_hash64_sql,
    )

    base = portable_hash64_sql(
        "concat('fscene|', CAST(l.doc_id // 5 AS VARCHAR), ':', "
        "CAST(f.f // l.slen AS VARCHAR), ':', CAST(u.u AS VARCHAR), ':', "
        "CAST(r.r AS VARCHAR))"
    )
    n_bands = 56 // _SRD_BAND_BITS
    mask = (1 << _SRD_BAND_BITS) - 1
    thr = _SCENE_CUT_THRESHOLD * 64 * _SCENE_FIXTURE_SCALE
    return f"""
WITH L AS (
  SELECT doc_id,
         CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 4 WHEN 2 THEN 5
              ELSE 12 END AS slen,
         doc_id % 5 AS var
  FROM documents
),
cells AS MATERIALIZED (
  SELECT l.doc_id, f.f, r.r, u.u,
         12 * LEAST(
           CASE WHEN r.r = l.var AND u.u = l.var
                THEN ({base} % 256 + 128) % 256
                ELSE {base} % 256 END
           + CASE WHEN r.r = f.f % 8 AND u.u = f.f % 8 THEN 1 ELSE 0 END,
           255) AS v
  FROM L l, range(12) f(f), range(8) r(r), range(8) u(u)
),
d1 AS (
  SELECT a.doc_id, a.f, sum(abs(a.v - b.v)) AS delta
  FROM cells a JOIN cells b
    ON b.doc_id = a.doc_id AND b.f = a.f - 1
   AND b.r = a.r AND b.u = a.u
  GROUP BY a.doc_id, a.f
),
flags AS (
  SELECT c.doc_id, c.f,
         coalesce(CASE WHEN d1.delta > {thr} THEN 1 ELSE 0 END, 0) AS cut
  FROM (SELECT DISTINCT doc_id, f FROM cells) c
  LEFT JOIN d1 ON d1.doc_id = c.doc_id AND d1.f = c.f
),
sc AS (
  SELECT doc_id, f,
         sum(cut) OVER (PARTITION BY doc_id ORDER BY f
                        ROWS UNBOUNDED PRECEDING) AS scene_idx
  FROM flags
),
reps AS MATERIALIZED (
  SELECT doc_id, scene_idx, min(f) AS repf
  FROM sc GROUP BY doc_id, scene_idx
),
rbits AS (
  SELECT p.doc_id, p.scene_idx, a.r * 7 + a.u AS k,
         CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
  FROM reps p
  JOIN cells a ON a.doc_id = p.doc_id AND a.f = p.repf
  JOIN cells b ON b.doc_id = p.doc_id AND b.f = p.repf
             AND b.r = a.r AND b.u = a.u + 1
  WHERE a.u < 7
),
fp AS MATERIALIZED (
  SELECT doc_id, scene_idx,
         CAST(sum(bit * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS h
  FROM rbits GROUP BY doc_id, scene_idx
),
bands AS (
  SELECT doc_id, scene_idx, h, b.b,
         (h >> (b.b * {_SRD_BAND_BITS})) & {mask} AS bucket
  FROM fp, range({n_bands}) b(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS da, a.scene_idx AS sa,
         b.doc_id AS db, b.scene_idx AS sb, a.h AS ha, b.h AS hb
  FROM bands a JOIN bands b
    ON a.b = b.b AND a.bucket = b.bucket
   AND a.doc_id * {_SRD_FACTOR} + a.scene_idx
       < b.doc_id * {_SRD_FACTOR} + b.scene_idx
)
SELECT da AS doc_a, CAST(sa AS BIGINT) AS scene_a,
       db AS doc_b, CAST(sb AS BIGINT) AS scene_b,
       CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 4
"""


@register("q163_scene_rep_dedup", oracle=_scene_rep_dedup_oracle())
def q163_scene_rep_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-level video dedup (multimodal.scene_representative_dedup):
    one RVID decode per clip → pooled per-frame meshes → the q157 cut
    rule segments scenes → the FIRST frame of each scene gets a 56-bit
    dHash packed JVM-side from the SAME mesh rows (no second decode,
    no Python past the map stage) → the shared banded-hamming kernel
    joins (video, scene) entities at the tuner-derived
    {_SRD_BAND_BITS}-bit bands. The oracle replays texture synthesis,
    pooling, the delta/threshold/running-count segmentation, rep-frame
    selection, dHash packing, banding, and the hamming verify in
    closed form — a segmentation, rep-selection, packing, or banding
    bug hash-fails. Scale shape: video bytes never shuffle; the banded
    join sees one row per SCENE (~1/L of per-frame dedup input), and
    the pair set is pytest-pinned ⊆ the all-frames pair set."""
    from openstack_billing_from_db_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    pay = multimodal.synthesize_family_scene_video_payloads(docs)
    return multimodal.scene_representative_dedup(
        pay,
        cut_threshold=_SCENE_CUT_THRESHOLD,
        band_bits=_SRD_BAND_BITS,
    )
