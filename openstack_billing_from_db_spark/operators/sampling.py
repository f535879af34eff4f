"""Deterministic, engine-portable sampling operators.

A training-data pipeline needs samples that are (a) reproducible across
runs and engines, (b) stratified (per-language / per-source quotas), and
(c) computable map-side with zero shuffle — membership must be a pure
function of the row, never of partitioning or iteration order. Spark's
``df.sample`` is none of these (seed interacts with partition layout), so
sampling here is hash-gated: keep a row iff a seeded portable
(md5-derived) hash of its id, mod 100, falls under the stratum's rate.

Reference: no sampling exists in the reference (beyond-reference
north-star component); the same primitive backs the q66 train/val/test
split.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.functions.hashing import seeded_hash64


def stratum_rate(strata_col: Column, rates: Mapping[str, int], default: int = 0) -> Column:
    """Percentage (0-100) quota for a row's stratum as a Column."""
    expr: Column = F.lit(default)
    for stratum, pct in sorted(rates.items()):
        expr = F.when(strata_col == stratum, F.lit(pct)).otherwise(expr)
    return expr


def stratified_hash_sample(
    df: DataFrame,
    *,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, int],
    seed: str = "sample",
    default_pct: int = 0,
) -> DataFrame:
    """Keep each row iff ``seeded_hash(id) % 100 < rates[stratum]``.

    Pure row-local projection + filter: no shuffle, pushes past column
    pruning, and yields the identical sample on any cluster layout. The
    per-stratum expected rate is exact in distribution and, because the
    hash is shared across strata, samples for nested rate configs are
    monotone (a 10% sample is a subset of the 25% sample)."""
    bucket = seeded_hash64(F.col(id_col).cast("string"), seed) % 100
    return df.filter(bucket < stratum_rate(F.col(strata_col), rates, default_pct))


def priority_sample(
    df: DataFrame,
    *,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "pri",
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows without replacement —
    integer-floored priority sampling (Duffield, Lund & Thorup 2007).

    Each row draws the deterministic uniform ``u = seeded_hash(key)``
    (60-bit) and gets inverse priority ``q = u div w`` (``w`` a positive
    integer weight, e.g. cents); the sample is the k smallest ``q``
    (ties broken by key). Small ``q`` ⇔ large ``w/u``, so inclusion
    probability rises with weight, heavy rows are near-certain members,
    and the sample is reproducible across runs, engines, and partition
    layouts (unlike ``df.sample``). The floor keeps every comparison in
    BIGINT — engine-exact, no doubles anywhere.

    Plan shape: a map-side projection then a global top-k —
    TakeOrderedAndProject, so each partition keeps only its local k and
    the driver merges k-sized heaps; the input never shuffles. The final
    rank is a window over the already-collected k rows (bounded, k-row
    single partition by construction).

    Output: (key, weight, priority, rnk), rnk 1..k by (priority, key).
    """
    pri = df.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
        seeded_hash64(F.col(key_col).cast("string"), seed).alias("_u"),
    ).select("key", "weight", F.expr("_u div weight").alias("priority"))
    top = pri.orderBy("priority", "key").limit(k)
    w = Window.orderBy("priority", "key")
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def priority_sample_per_group(
    df: DataFrame,
    *,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "pri",
) -> DataFrame:
    """Per-group weighted sample: the k best priority-sample rows WITHIN
    each group (Duffield-Lund-Thorup priorities, as :func:`priority_sample`,
    but stratified). Global top-k keeps whole strata out of small samples;
    per-group k guarantees every stratum is represented — the shape used
    for per-source eval slices and per-language inspection samples.

    Plan shape: map-side priority projection, then ONE hash exchange on
    the group key feeding a bounded window (rank ≤ k) — no global sort,
    no driver merge; output is at most k rows per group regardless of
    input size. Contrast with :func:`priority_sample`'s
    TakeOrderedAndProject, which never shuffles but returns a single
    global k.

    Output: (group, key, weight, priority, rnk), rnk 1..k per group by
    (priority, key).
    """
    pri = df.select(
        F.col(group_col).alias("grp"),
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
        seeded_hash64(F.col(key_col).cast("string"), seed).alias("_u"),
    ).select("grp", "key", "weight", F.expr("_u div weight").alias("priority"))
    w = Window.partitionBy("grp").orderBy("priority", "key")
    return (
        pri.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .withColumnRenamed("grp", group_col)
    )


def temperature_mixture_sample(
    df: DataFrame,
    *,
    id_col: str,
    source_col: str,
    alpha: float = 0.5,
    target_fraction: float = 0.3,
    seed: str = "mix",
) -> DataFrame:
    """Temperature-based source mixing (the multinomial-smoothing step of
    GPT-3/PaLM-style data recipes): source s gets sampling mass
    p_s ∝ n_s^α, flattening the natural distribution toward uniform as
    α→0, and each row is kept by the same portable hash gate the other
    samplers use, at per-source rate

        rate_s = min(1, target_fraction · N · p_s / n_s)

    expressed in basis points (floor to int → engine-exact arithmetic
    after the pow/division, shared with the oracle).

    Plan shape: one partial-agg ``groupBy(source)`` for the counts (tiny
    output), rates computed on that dimension table, then a BROADCAST
    join back and a map-side hash filter — the corpus itself shuffles
    zero times. Derived rates are data-dependent, which is exactly what
    fixed-rate ``stratified_hash_sample`` cannot express."""
    counts = df.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    totals = counts.agg(
        F.sum("__n").alias("__total"), F.sum(F.pow("__n", F.lit(alpha))).alias("__Z")
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        "__src",
        "__n",
        F.least(
            F.lit(10000),
            F.floor(
                F.lit(target_fraction)
                * F.col("__total")
                * (F.pow("__n", F.lit(alpha)) / F.col("__Z"))
                / F.col("__n")
                * 10000
            ),
        )
        .cast("long")
        .alias("__rate_bp"),
    )
    bucket = seeded_hash64(F.col(id_col).cast("string"), seed) % 10000
    return (
        df.join(F.broadcast(rates), F.col(source_col) == F.col("__src"))
        .filter(bucket < F.col("__rate_bp"))
        .drop("__src", "__n", "__rate_bp")
    )
