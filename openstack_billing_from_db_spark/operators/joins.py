"""Skew-mitigated join strategies.

At 100 TB the failure mode of a plain shuffle join is not volume but
SKEW: one hot key (a viral document source, a default/null-ish foreign
key, a celebrity user) lands an entire reducer's worth of rows in a
single task and the stage runs at the speed of its slowest key. Three
defenses, in preference order:

1. ``broadcast(dim)`` — no shuffle at all; only for dims that fit an
   executor (the billing plans use this for rates/outages).
2. AQE skew-join (``spark.sql.adaptive.skewJoin``) — splits oversized
   SORT-MERGE partitions at runtime; free when AQE is on, but only
   covers sort-merge joins and only splits at shuffle-block granularity.
3. Salting (this module) — replicate the small side ``n_salts`` times
   and scatter the fact side's hot keys across the replicas with a
   deterministic row-local salt. Works for ANY join strategy (including
   shuffled-hash, which AQE's skew splitter does not cover), at the cost
   of an ``n_salts``× blow-up of the small side.

The salt must be a function of something row-unique on the fact side
(NOT of the join key — all copies of the hot key would land on one
replica again); the caller passes that expression. Equality with the
unsalted join is structural: every fact row meets exactly one replica
of its dim row (the one carrying its salt), so the join multiset is
unchanged — pinned by tests/test_salted_join.py.

Reference: the reference joins a handful of rows in one process and has
no skew concept (beyond-reference scale component).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.functions.hashing import seeded_hash64


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    key: str,
    salt_from: Column,
    n_salts: int = 8,
    how: str = "inner",
    force_shuffle: bool = True,
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``key`` with the fact side scattered
    across ``n_salts`` replicas of the dim side.

    ``salt_from`` is a row-unique fact-side expression (e.g. the
    primary-key column); the salt is a portable seeded hash of it, so
    the scatter is deterministic and layout-independent. With
    ``force_shuffle`` (default) the dim side carries a ``shuffle_hash``
    hint — the point of salting is the non-broadcastable case, and
    letting Catalyst silently broadcast would make the demo (and any
    test of it) vacuous; pass ``False`` to let the optimizer choose.

    Output: the same rows a plain ``fact.join(dim, key, how)`` yields
    (salt column dropped); column order fact-then-dim.
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    dim_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    if force_shuffle:
        dim_rep = dim_rep.hint("shuffle_hash")
    fact_s = fact.withColumn(
        "__salt",
        (seeded_hash64(salt_from.cast("string"), "salt") % n_salts).cast("int"),
    )
    return fact_s.join(dim_rep, [key, "__salt"], how).drop("__salt")
