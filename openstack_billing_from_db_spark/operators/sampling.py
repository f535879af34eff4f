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

from pyspark.sql import Column, DataFrame
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
