"""Similarity search over embedding columns (``array<float>``).

Two paths:
- brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set against the corpus, rank per query. One broadcast join + one
  window; the corpus is never shuffled.
- sign-LSH (random hyperplane) bucketed top-k — the scale path: each
  vector gets an n_planes-bit bucket from data-independent ±1 hyperplanes
  (derived from md5, so the DuckDB oracle reproduces them exactly);
  candidates are same-bucket pairs only.

All dot products fold left-to-right over array<double> (deterministic,
matches DuckDB's list_inner_product bit-for-bit — verified empirically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from openstack_billing_from_db_spark.functions.hashing import py_hash64


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


def hyperplane_signs(n_planes: int, dims: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 — data-independent constants
    shared verbatim with the oracle SQL."""
    return [
        [1.0 if py_hash64(f"hp{j}|{i}") % 2 == 0 else -1.0 for i in range(dims)]
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
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("e")
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


def lsh_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 10,
    k: int = 5,
    n_planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k: rank by cosine only within the query's LSH
    bucket. Recall is probabilistic (bucket misses are the ANN trade);
    at scale the bucket column is the shuffle/partition key, so each
    query touches 1/2^n_planes of the corpus."""
    signs = hyperplane_signs(n_planes, dims)
    # persisted: the bucketed/normed corpus is the reusable index — the
    # cache manager shares it across every LSH query in the session
    base = emb.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("e")
    ).withColumn("bucket", lsh_bucket(F.col("e"), signs)).withColumn(
        "e_norm", norm(F.col("e"))
    ).persist()
    queries = base.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"),
        F.col("e").alias("q"),
        F.col("bucket").alias("qbucket"),
        F.col("e_norm").alias("q_norm"),
    )
    cand = base.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vid") != F.col("query_id")),
    )
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
    n_planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH bucketing: only same-bucket
    pairs are scored. Output: (vec_a, vec_b, cos ≥ threshold)."""
    signs = hyperplane_signs(n_planes, dims)
    # persisted: the bucketed/normed corpus is the reusable index — the
    # cache manager shares it across every LSH query in the session
    base = emb.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("e")
    ).withColumn("bucket", lsh_bucket(F.col("e"), signs)).withColumn(
        "e_norm", norm(F.col("e"))
    ).persist()
    a = base.select(F.col("bucket"), F.col("vid").alias("vec_a"), F.col("e").alias("ea"), F.col("e_norm").alias("na"))
    b = base.select(F.col("bucket"), F.col("vid").alias("vec_b"), F.col("e").alias("eb"), F.col("e_norm").alias("nb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
