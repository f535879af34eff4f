"""bucketed_overlap_join (operators/joins.py): the bucket decomposition
must emit every overlapping directed pair EXACTLY once — pinned against
a Python brute force over random interval sets, plus the boundary edges
(touching intervals, empty intervals, bucket-straddling spans)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from openstack_billing_from_db_spark.operators.joins import (
    bucketed_overlap_join,
)

W = 10  # tiny bucket width so intervals straddle many buckets


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(rows)],
        "iid long, s_us long, e_us long",
    )


def _brute(rows_a, rows_b):
    out = set()
    for i, (sa, ea) in enumerate(rows_a):
        if ea <= sa:
            continue
        for j, (sb, eb) in enumerate(rows_b):
            if eb <= sb:
                continue
            if sa < eb and sb < ea:
                out.add((i, j, min(ea, eb) - max(sa, sb)))
    return out


intervals = st.lists(
    st.tuples(st.integers(0, 100), st.integers(0, 100)), min_size=0, max_size=25
)

# negative coordinates: with truncate-toward-zero bucketing, bucket 0
# spans 2W−1 units and pairs straddling zero are emitted twice or missed
# (ADVICE r5, joins.py floor-division) — the operator is generic even
# though q125's unix-micros inputs are non-negative
signed_intervals = st.lists(
    st.tuples(st.integers(-100, 100), st.integers(-100, 100)),
    min_size=0,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(rows_a=intervals, rows_b=intervals)
def test_overlap_join_matches_brute_force(spark, rows_a, rows_b):
    # compared as sorted MULTISETS so a regression of the first-common-
    # bucket rule (pair emitted once per shared bucket) fails loudly —
    # a set compare would silently absorb duplicate emissions
    got = sorted(
        (r.a_iid, r.b_iid, r.overlap_us)
        for r in bucketed_overlap_join(
            _df(spark, rows_a), _df(spark, rows_b), bucket_us=W
        ).collect()
    )
    assert got == sorted(_brute(rows_a, rows_b))


@settings(max_examples=12, deadline=None)
@given(rows_a=signed_intervals, rows_b=signed_intervals)
def test_overlap_join_matches_brute_force_negative_coords(
    spark, rows_a, rows_b
):
    got = sorted(
        (r.a_iid, r.b_iid, r.overlap_us)
        for r in bucketed_overlap_join(
            _df(spark, rows_a), _df(spark, rows_b), bucket_us=W
        ).collect()
    )
    assert got == sorted(_brute(rows_a, rows_b))


def test_negative_straddling_pair_emitted_once(spark):
    # [-25, 5) × [-5, 15): first common bucket is floor(-5/10) = -1;
    # truncation would compute 0 and still match, so pin the harder
    # case [-25, -5) × [-15, -1) too (first common bucket -2)
    rows = bucketed_overlap_join(
        _df(spark, [(-25, 5)]), _df(spark, [(-5, 15)]), bucket_us=W
    ).collect()
    assert len(rows) == 1 and rows[0].overlap_us == 10
    rows = bucketed_overlap_join(
        _df(spark, [(-25, -5)]), _df(spark, [(-15, -1)]), bucket_us=W
    ).collect()
    assert len(rows) == 1 and rows[0].overlap_us == 10


def test_touching_intervals_do_not_overlap(spark):
    # half-open semantics: [0, 10) and [10, 20) share no instant
    got = bucketed_overlap_join(
        _df(spark, [(0, 10)]), _df(spark, [(10, 20)]), bucket_us=W
    ).collect()
    assert got == []


def test_straddling_pair_emitted_once(spark):
    # both intervals cover many buckets; the pair must appear exactly once
    rows = bucketed_overlap_join(
        _df(spark, [(5, 95)]), _df(spark, [(50, 120)]), bucket_us=W
    ).collect()
    assert len(rows) == 1
    assert rows[0].overlap_us == 45


def test_span_guard_raises(spark):
    df = _df(spark, [(0, 100)])
    with pytest.raises(Exception) as ei:
        bucketed_overlap_join(
            df, df, bucket_us=W, max_span_buckets=5
        ).collect()
    assert "spans" in str(ei.value)


def test_bad_bucket_width_rejected(spark):
    df = _df(spark, [(0, 10)])
    with pytest.raises(ValueError):
        bucketed_overlap_join(df, df, bucket_us=0)


# --- auto-tuned bucket width (VERDICT r5 Next #7) ---------------------------


def _cost_proxies(spark, df, w):
    """Deterministic cost model of the bucket decomposition at width w:
    (replicated rows after explode, candidate pairs meeting on a
    bucket) — the two terms the W-law trades off. Timing on this VM has
    5x run variance; these proxies are exact."""
    from pyspark.sql import functions as F

    live = df.filter(F.col("e_us") > F.col("s_us"))
    n_repl = live.select(
        F.expr(f"((e_us - 1) div {w}) - (s_us div {w}) + 1").alias("nb")
    ).agg(F.sum("nb")).collect()[0][0]
    per_bucket = (
        live.select(F.explode(F.expr(
            f"sequence(s_us div {w}, (e_us - 1) div {w})"
        )).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_cand = per_bucket.agg(F.sum(F.col("n") * F.col("n"))).collect()[0][0]
    return int(n_repl), int(n_cand)


def test_auto_bucket_us_median_and_validation(spark):
    from openstack_billing_from_db_spark.operators.joins import auto_bucket_us

    # lengths 10m/20m/30m (in us): the 20m median lands in the
    # [20m, 21m) histogram bin, whose upper edge rounds the estimate UP
    # to a whole 21-minute width (always >= the true median)
    m = 60_000_000
    df = _df(spark, [(0, 10 * m), (0, 20 * m), (0, 30 * m)])
    w = auto_bucket_us(df)
    assert w == 21 * m
    with pytest.raises(ValueError):
        auto_bucket_us(_df(spark, [(5, 5)]))  # no non-empty intervals


def test_auto_bucket_within_hand_picked_cost_envelope(spark, sf_dir):
    """On the real q125 session table, the auto-tuned W must land inside
    the hand-picked 1h width's cost envelope: neither deterministic cost
    proxy (replication, per-bucket candidate pairs) more than 4x the
    hand-picked width's."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from openstack_billing_from_db_spark.operators.joins import auto_bucket_us
    from openstack_billing_from_db_spark.plans.analytics_queries import (
        _CONC_BUCKET_US,
        _GAP,
    )
    from openstack_billing_from_db_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    sw = ev.groupBy(F.session_window("ts", _GAP).alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    s = sw.select(
        "user_id",
        F.unix_micros(F.col("w.start")).alias("s_us"),
        F.unix_micros(F.col("w.end")).alias("e_us"),
    )
    w_auto = auto_bucket_us(s)
    repl_a, cand_a = _cost_proxies(spark, s, w_auto)
    repl_h, cand_h = _cost_proxies(spark, s, _CONC_BUCKET_US)
    assert repl_a <= 4 * repl_h, (w_auto, repl_a, repl_h)
    assert cand_a <= 4 * cand_h, (w_auto, cand_a, cand_h)
    # and the join OUTPUT is identical at both widths (W is cost-only)
    a = sorted(
        map(tuple, bucketed_overlap_join(s, s, bucket_us=w_auto).collect())
    )
    h = sorted(
        map(
            tuple,
            bucketed_overlap_join(s, s, bucket_us=_CONC_BUCKET_US).collect(),
        )
    )
    assert a == h
