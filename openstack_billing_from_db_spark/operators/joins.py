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
    primary-key column); the salt is a deterministic, layout-independent
    hash of it. xxhash64 rather than the md5-based portable family: the
    salt never appears in any oracle (the result is pinned against the
    UNSALTED join), so cross-engine portability buys nothing while md5
    costs ~10× more per row on the full fact side (guide §1.2). With
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
        F.pmod(
            F.xxhash64(F.lit("salt"), salt_from.cast("string")), F.lit(n_salts)
        ).cast("int"),
    )
    return fact_s.join(dim_rep, [key, "__salt"], how).drop("__salt")


def auto_bucket_us(
    intervals: DataFrame,
    *,
    start_col: str = "s_us",
    end_col: str = "e_us",
    coarse_bin_us: int = 60_000_000,
) -> int:
    """Pick :func:`bucketed_overlap_join`'s bucket width from the data
    instead of making the caller guess: the join's intermediate is
    minimized with W near the TYPICAL interval length (PLANS.md's
    measured W-law — far above it degrades toward a per-bucket
    cartesian, far below it pays pure replication), so estimate the
    median length with the mergeable histogram machinery
    (operators/quantiles) and round UP to a whole ``coarse_bin_us``
    bin. One coarse-binned aggregation (≤ a few thousand cells for any
    realistic length distribution) and a 1-row driver read — the same
    bounded-barrier budget as the outage probe. W does not affect the
    join's OUTPUT (exactly-once emission holds for any W > 0), only its
    cost, so callers can adopt auto-W without touching oracles."""
    from openstack_billing_from_db_spark.operators.quantiles import (
        histogram_cells,
        quantiles_from_cells,
    )

    lengths = intervals.filter(F.col(end_col) > F.col(start_col)).select(
        F.lit(0).alias("g"),
        (F.col(end_col) - F.col(start_col)).alias("len_us"),
    )
    cells = histogram_cells(
        lengths, group_col="g", value_col="len_us", bin_width=coarse_bin_us
    )
    row = quantiles_from_cells(
        cells, group_col="g", bin_width=coarse_bin_us, p_micro=(500_000,)
    ).collect()
    if not row:
        raise ValueError("auto_bucket_us: no non-empty intervals")
    # p50_est is the inclusive upper EDGE of the median's bin
    # ((bin+1)·binw − 1); +1 yields a whole-bin width ≥ the median
    return int(row[0].p50_est) + 1


def bucketed_overlap_join(
    a: DataFrame,
    b: DataFrame,
    *,
    start_col: str = "s_us",
    end_col: str = "e_us",
    bucket_us: int,
    max_span_buckets: int = 4096,
) -> DataFrame:
    """Big-big interval OVERLAP join via fixed-width bucket
    decomposition — the standard distributed answer when NEITHER
    interval side fits a broadcast (q26 covers the broadcast case).

    Each half-open interval [s, e) explodes onto the width-``bucket_us``
    buckets it covers; overlapping pairs then meet on an EQUI-join key
    (bucket), which Catalyst shuffles/hashes like any other key — no
    theta-join, no cartesian. Two intervals overlap iff they share
    every bucket in [floor(max_s/W), floor((min_e−1)/W)], so emitting a
    pair only where ``bucket == floor(max_s/W)`` (the FIRST common
    bucket) yields each directed pair EXACTLY once — no output-sized
    ``distinct`` exchange, the same dedup-free-emission law as the
    minhash canonical band.

    Cost shape: replication is (len/W + 1) rows per interval (bounded
    by ``max_span_buckets``, enforced map-side with assert_true); the
    join intermediate is Σ_b |A_b|·|B_b|, minimized by picking W near
    the typical interval length — W far above it degrades toward a
    per-bucket cartesian, far below it pays pure replication. Output
    rows carry every input column prefixed ``a_``/``b_`` plus
    ``overlap_us``; self-pair filtering (for self-joins) is the
    caller's predicate on its own keys.

    Intervals with ``e <= s`` are dropped (empty — can overlap
    nothing). Beyond-reference scale component; the interval algebra
    (clamping, state intervals) lives in operators/intervals.py.
    """
    W = int(bucket_us)
    if W <= 0:
        raise ValueError(f"bucket_us must be positive; got {W}")

    def _fdiv(expr: str) -> str:
        # FLOOR division (pure integer ops), not Spark `div` (truncate
        # toward zero): with truncation, bucket 0 spans 2W−1 units when
        # coordinates go negative, skewing the replication bound and
        # the max_span_buckets guard. Same construction as
        # quantiles._floor_bin; matches DuckDB `//` for negatives.
        return f"((({expr}) - (((({expr}) % {W}) + {W}) % {W})) div {W})"

    def _side(df: DataFrame, p: str) -> DataFrame:
        keep = [F.col(c).alias(f"{p}{c}") for c in df.columns]
        # assert_true yields NULL on pass (coalesce falls through) and
        # raises on violation — the span guard costs zero extra actions
        span_ok = (
            f"coalesce(CAST(assert_true("
            f"{_fdiv(f'{end_col} - 1')} - {_fdiv(start_col)} "
            f"< {max_span_buckets}, "
            f"'bucketed_overlap_join: interval spans more than "
            f"{max_span_buckets} buckets; raise bucket_us or "
            f"max_span_buckets') AS BIGINT), 0)"
        )
        return (
            df.filter(F.col(end_col) > F.col(start_col))
            .select(
                *keep,
                F.explode(
                    F.expr(
                        f"sequence({_fdiv(start_col)} + {span_ok}, "
                        f"{_fdiv(f'{end_col} - 1')})"
                    )
                ).alias(f"{p}bkt"),
            )
        )

    left = _side(a, "a_")
    right = _side(b, "b_")
    a_s, a_e = f"a_{start_col}", f"a_{end_col}"
    b_s, b_e = f"b_{start_col}", f"b_{end_col}"
    return (
        left.join(
            right,
            (F.col("a_bkt") == F.col("b_bkt"))
            & (F.col(a_s) < F.col(b_e))
            & (F.col(b_s) < F.col(a_e))
            # first common bucket → exactly-once emission per pair
            & (
                F.expr(_fdiv(f"greatest({a_s}, {b_s})")) == F.col("a_bkt")
            ),
        )
        .drop("a_bkt", "b_bkt")
        .withColumn(
            "overlap_us",
            F.expr(f"least({a_e}, {b_e}) - greatest({a_s}, {b_s})"),
        )
    )
