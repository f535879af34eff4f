"""Unit tests for the sketch/sampling/encoder additions: KMV distinct
sketch (operators/sketch.py), weighted priority sampling
(operators/sampling.priority_sample), and corpus BPE encoding
(operators/bpe.bpe_encode). Oracle parity for q98/q99/q100 runs in
test_oracle_parity.py; these pin the branches and invariants the
registered queries don't reach at the test sf."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.operators.bpe import bpe_encode, bpe_train
from openstack_billing_from_db_spark.operators.sampling import priority_sample
from openstack_billing_from_db_spark.operators.sketch import KMV_M, kmv_distinct


def test_kmv_exact_branch_under_k(spark):
    # fewer distinct values than k → the sketch IS the exact count
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(5)] + [("g", "v0")], "grp string, v string"
    )
    row = kmv_distinct(df, group_col="grp", value_col="v", k=16).collect()[0]
    assert row.n_distinct_exact == 5
    assert row.k_used == 5
    assert row.est_distinct == 5


def test_kmv_estimate_branch_bounds(spark):
    # 500 distinct values, k=16 → estimate within a loose 3x band and
    # computed from the k-th minimum hash exactly
    df = spark.createDataFrame(
        [("g", f"value-{i}") for i in range(500)], "grp string, v string"
    )
    row = kmv_distinct(df, group_col="grp", value_col="v", k=16).collect()[0]
    assert row.n_distinct_exact == 500
    assert row.k_used == 16
    assert row.est_distinct == (15 * KMV_M) // row.kth_hash
    assert 500 / 3 < row.est_distinct < 500 * 3


def test_kmv_rejects_bad_k(spark):
    df = spark.createDataFrame([("g", "v")], "grp string, v string")
    with pytest.raises(ValueError):
        kmv_distinct(df, group_col="grp", value_col="v", k=1)
    with pytest.raises(ValueError):
        kmv_distinct(df, group_col="grp", value_col="v", k=2048)


def test_kmv_merge_property(spark):
    # KMV is a mergeable sketch: the k minima of a union are the k
    # minima of the concatenated per-part minima. Model the two-executor
    # case by unioning two disjoint halves and checking the union's
    # sketch equals the sketch of the whole.
    rows = [("g", f"value-{i}") for i in range(400)]
    whole = spark.createDataFrame(rows, "grp string, v string")
    union = spark.createDataFrame(rows[:150], "grp string, v string").union(
        spark.createDataFrame(rows[150:], "grp string, v string")
    )
    a = kmv_distinct(whole, group_col="grp", value_col="v", k=16).collect()[0]
    b = kmv_distinct(union, group_col="grp", value_col="v", k=16).collect()[0]
    assert (a.kth_hash, a.est_distinct) == (b.kth_hash, b.est_distinct)


def test_kmv_overlap_exact_under_k(spark):
    from openstack_billing_from_db_spark.operators.sketch import (
        kmv_pairwise_overlap,
    )

    # unions smaller than k → the sketch IS the full union: exact
    rows = (
        [("a", f"v{i}") for i in range(6)]
        + [("b", f"v{i}") for i in range(3, 9)]  # |a ∩ b| = 3, |a ∪ b| = 9
        + [("c", "zz")]  # disjoint from both
    )
    df = spark.createDataFrame(rows, "grp string, v string")
    out = {
        (r.grp_a, r.grp_b): r
        for r in kmv_pairwise_overlap(
            df, group_col="grp", value_col="v", k=16
        ).collect()
    }
    ab = out[("a", "b")]
    assert ab.est_union == 9 and ab.matches == 3 and ab.est_intersection == 3
    assert ab.jaccard_micro == 3 * 1_000_000 // 9
    assert out[("a", "c")].matches == 0 == out[("a", "c")].est_intersection
    assert out[("b", "c")].jaccard_micro == 0
    assert len(out) == 3


def test_kmv_overlap_identical_sets_full_jaccard(spark):
    from openstack_billing_from_db_spark.operators.sketch import (
        kmv_pairwise_overlap,
    )

    # two identical 200-value sets, k=16: every union minimum is in both
    # sketches → jaccard_micro = 1e6 exactly, est_intersection = est_union
    rows = [(g, f"value-{i}") for g in ("a", "b") for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, v string")
    r = kmv_pairwise_overlap(df, group_col="grp", value_col="v", k=16).collect()[0]
    assert r.k_used == 16
    assert r.matches == 16
    assert r.jaccard_micro == 1_000_000
    assert r.est_intersection == r.est_union
    assert 200 / 3 < r.est_union < 200 * 3


def test_countmin_never_underestimates(spark):
    from openstack_billing_from_db_spark.operators.sketch import (
        countmin_build,
        countmin_probe,
    )

    vals = [(f"v{i % 37}",) for i in range(1000)]
    df = spark.createDataFrame(vals, "v string")
    sketch = countmin_build(df, value_col="v")
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("exact"))
    est = countmin_probe(sketch, exact, value_col="v").collect()
    assert len(est) == 37
    for r in est:
        assert r.est_count >= r.exact  # collisions only ever ADD


def test_countmin_exact_when_no_collisions(spark):
    from openstack_billing_from_db_spark.operators.sketch import (
        countmin_build,
        countmin_probe,
    )

    # 5 distinct values in a 4x256 sketch: P(collision in ALL 4 rows)
    # is negligible, and min-over-rows recovers the exact counts
    df = spark.createDataFrame(
        [(f"val{i % 5}",) for i in range(50)], "v string"
    )
    sketch = countmin_build(df, value_col="v")
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("exact"))
    for r in countmin_probe(sketch, exact, value_col="v").collect():
        assert r.est_count == r.exact == 10


def test_countmin_merge_by_addition(spark):
    from openstack_billing_from_db_spark.operators.sketch import (
        countmin_build,
        countmin_probe,
    )

    rows = [(f"v{i % 11}",) for i in range(300)]
    whole = spark.createDataFrame(rows, "v string")
    h1 = spark.createDataFrame(rows[:100], "v string")
    h2 = spark.createDataFrame(rows[100:], "v string")
    merged = (
        countmin_build(h1, value_col="v")
        .unionByName(countmin_build(h2, value_col="v"))
        .groupBy("cm_row", "cm_bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    probes = whole.select("v").distinct()
    a = {r.v: r.est_count for r in countmin_probe(
        countmin_build(whole, value_col="v"), probes, value_col="v").collect()}
    b = {r.v: r.est_count for r in countmin_probe(
        merged, probes, value_col="v").collect()}
    assert a == b


def test_priority_sample_weight_bias_and_determinism(spark):
    # one heavy row among uniform light rows → the heavy row is sampled
    # (inverse priority u div w shrinks with weight); two runs agree.
    rows = [(i, 100) for i in range(1, 200)] + [(999, 1_000_000)]
    df = spark.createDataFrame(rows, "key long, w long")
    s1 = priority_sample(df, key_col="key", weight_col="w", k=10).collect()
    s2 = priority_sample(df, key_col="key", weight_col="w", k=10).collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]
    assert len(s1) == 10
    keys = {r.key for r in s1}
    assert 999 in keys
    assert [r.rnk for r in s1] == sorted(r.rnk for r in s1) == list(range(1, 11))
    # ranks follow (priority, key) order
    assert all(
        (a.priority, a.key) < (b.priority, b.key) for a, b in zip(s1, s1[1:])
    )


def test_priority_sample_takeordered_plan(spark):
    # the top-k must be TakeOrderedAndProject (per-partition heaps),
    # never a global sort exchange
    df = spark.createDataFrame([(i, 10) for i in range(100)], "key long, w long")
    plan = (
        priority_sample(df, key_col="key", weight_col="w", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_bpe_encode_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    enc = bpe_encode(docs, n_merges=2)
    rows = enc.collect()
    assert len(rows) == 50
    base = {
        r.doc_id: r.n_chars_nospace
        for r in docs.select(
            "doc_id",
            F.length(F.regexp_replace("text", r"\s", "")).alias("n_chars_nospace"),
        ).collect()
    }
    for r in rows:
        # merges only ever shrink the token stream; never below one
        # token per word; zero merges would equal character count
        assert r.n_words <= r.n_tokens_bpe <= base[r.doc_id]


def test_bpe_encode_zero_merges_is_char_count(spark):
    docs = spark.createDataFrame(
        [(1, "ab abc"), (2, "a")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bpe_encode(docs, n_merges=0).collect()}
    assert rows[1].n_words == 2 and rows[1].n_tokens_bpe == 5
    assert rows[2].n_words == 1 and rows[2].n_tokens_bpe == 1


def test_bpe_encode_applies_trained_merges(spark):
    # corpus where 'ab' is the clear top pair: every 'ab' bigram merges
    docs = spark.createDataFrame(
        [(1, "ab ab abx"), (2, "ab yab")], "doc_id long, text string"
    )
    rules = bpe_train(docs, n_merges=1).collect()
    assert rules[0].pair == "a b" and rules[0].merged == "ab"
    rows = {r.doc_id: r for r in bpe_encode(docs, n_merges=1).collect()}
    # doc1: 'ab'(1) 'ab'(1) 'abx'(2 tokens: ab,x) = 4
    assert rows[1].n_tokens_bpe == 4
    # doc2: 'ab'(1) 'yab'(2 tokens: y,ab) = 3
    assert rows[2].n_tokens_bpe == 3


# --- HyperLogLog ---------------------------------------------------------------


def test_hll_merge_law(spark):
    """merge(registers(A), registers(B)) == registers(A ∪ B) — the
    union law that lets daily HLL states compose by groupBy-max."""
    from openstack_billing_from_db_spark.operators.sketch import (
        hll_merge,
        hll_registers,
    )

    a = spark.createDataFrame(
        [("g", f"v{i}") for i in range(40)], "g string, v string"
    )
    b = spark.createDataFrame(
        [("g", f"v{i}") for i in range(20, 70)], "g string, v string"
    )
    union = a.union(b)
    merged = hll_merge(
        hll_registers(a, group_col="g", value_col="v").union(
            hll_registers(b, group_col="g", value_col="v")
        ),
        group_col="g",
    )
    direct = hll_registers(union, group_col="g", value_col="v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_estimate_accuracy_and_exact_small_range(spark):
    """Small groups take the linear-counting branch; estimates stay
    within the ~1.04/sqrt(m) ≈ 13% relative-error regime at m=64
    (loose 3-sigma bound ~40% asserted here to stay seed-stable)."""
    from openstack_billing_from_db_spark.operators.sketch import hll_distinct

    rows = [("big", f"x{i}") for i in range(2000)] + [
        ("small", f"y{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r.g: r for r in hll_distinct(df, group_col="g", value_col="v").collect()}
    assert out["big"].n_distinct_exact == 2000
    est_big = out["big"].est_milli / 1000.0
    assert 0.6 * 2000 <= est_big <= 1.4 * 2000, est_big
    est_small = out["small"].est_milli / 1000.0
    assert 0.5 * 10 <= est_small <= 2.0 * 10, est_small


# --- AMS F2 (self-join size) sketch ------------------------------------------


def test_ams_f2_single_key_is_exact(spark):
    # one key repeated n times: every Z_j = ±n, so each estimator is
    # exactly n² = F2 — est must equal exact with zero error
    from openstack_billing_from_db_spark.operators.sketch import ams_f2

    df = spark.createDataFrame([("k",)] * 7, "v string")
    row = ams_f2(df, value_col="v").collect()[0]
    assert row.n_rows == 7
    assert row.f2_exact == 49
    assert row.f2_est == 49
    assert row.rel_err_bp == 0


def test_ams_f2_matches_independent_python(spark):
    # the full pipeline (signs → sums → squares → median) against an
    # independent Python replay of the same md5-derived parity signs
    import hashlib

    from openstack_billing_from_db_spark.operators.sketch import AMS_D, ams_f2

    vals = [f"u{i % 13}" for i in range(100)] + ["hot"] * 40
    df = spark.createDataFrame([(v,) for v in vals], "v string")

    def sign(v: str, j: int) -> int:
        h = int(hashlib.md5(f"{v}#ams{j}".encode()).hexdigest()[:13], 16)
        return 1 - 2 * (h % 2)

    zs = [sum(sign(v, j) for v in vals) for j in range(AMS_D)]
    want_est = sorted(z * z for z in zs)[AMS_D // 2]
    from collections import Counter

    want_exact = sum(c * c for c in Counter(vals).values())
    row = ams_f2(df, value_col="v").collect()[0]
    assert row.f2_exact == want_exact
    assert row.f2_est == want_est


def test_ams_f2_null_keys_excluded(spark):
    # NULL join keys match nothing in a join, so they contribute nothing
    # to self-join size on either the exact or the estimator side
    from openstack_billing_from_db_spark.operators.sketch import ams_f2

    df = spark.createDataFrame(
        [("k",), ("k",), (None,), (None,), (None,)], "v string"
    )
    row = ams_f2(df, value_col="v").collect()[0]
    assert row.n_rows == 2
    assert row.f2_exact == 4
    assert row.f2_est == 4  # single key → every estimator exact
    assert row.rel_err_bp == 0


# --- token-budgeted epoch construction ---------------------------------------


def test_token_budget_sample_exact_semantics(spark):
    from openstack_billing_from_db_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = spark.createDataFrame(
        [(i, "s0", "w " * (10 * (i + 1))) for i in range(6)],
        "doc_id long, source string, text string",
    )
    out = token_budget_sample(
        docs, budget_tokens=60, seed="t"
    ).collect()
    # admitted in hash order until the cumsum would pass 60
    assert out, "expected at least one admitted doc"
    assert max(r.cum_tokens for r in out) <= 60
    # cum is consistent with the per-doc counts
    assert sum(r.n_tokens for r in out) == max(r.cum_tokens for r in out)
    import pytest

    with pytest.raises(ValueError):
        token_budget_sample(docs, budget_tokens=0)


def test_token_budget_pregate_identical_to_exact(spark, sf_dir):
    """The hash-prefix pre-gate (scale path) must be output-identical
    to the full per-source window whenever the margin holds."""
    from openstack_billing_from_db_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r.source, r.id, r.n_tokens, r.cum_tokens)
        for r in token_budget_sample(
            docs, budget_tokens=2000, seed="epoch0"
        ).collect()
    }
    gated = {
        (r.source, r.id, r.n_tokens, r.cum_tokens)
        for r in token_budget_sample(
            docs, budget_tokens=2000, seed="epoch0", pregate_margin=3.0
        ).collect()
    }
    assert exact == gated and exact


def test_token_budget_pregate_guard_raises(spark):
    """A margin whose gate drops enough tokens to undershoot the budget
    must fail loudly, not silently shrink the epoch. Deterministic
    construction: one heavy document whose seeded hash sits ABOVE the
    gate cut carries most of the tokens — the gate excludes it, the
    light survivors can't reach the budget, the guard fires."""
    import pytest

    from openstack_billing_from_db_spark.functions.hashing import py_hash64
    from openstack_billing_from_db_spark.operators.sampling import (
        token_budget_sample,
    )

    # find an id hashing into the top 10% of the 60-bit space under
    # seed "t" (the cut below lands at 0.9 of the space)
    heavy = next(
        i for i in range(10_000) if py_hash64(f"t|{i}") >= int(0.9 * (1 << 60))
    )
    light = [i for i in range(10_000) if i != heavy][:50]
    docs = spark.createDataFrame(
        [(heavy, "s0", "w " * 150)] + [(i, "s0", "one") for i in light],
        "doc_id long, source string, text string",
    )
    # total = 200 tokens, budget 150, margin 1.2 → frac 0.9: the heavy
    # doc is gated out, survivors carry ≤ 50 tokens < budget
    with pytest.raises(Exception) as ei:
        token_budget_sample(
            docs, budget_tokens=150, seed="t", pregate_margin=1.2
        ).collect()
    assert "pregate_margin" in str(ei.value)
    with pytest.raises(ValueError):
        token_budget_sample(docs, budget_tokens=10, pregate_margin=1.0)


def test_token_budget_pregate_guard_fires_at_exact_budget(spark):
    """kept_tok == budget EXACTLY with an active gate must also error:
    a zero-token document whose hash fell beyond the cut would be
    admitted by the exact path (cumsum stays == budget) but dropped by
    the gate, so the boundary is not provably output-identical — the
    guard errs loudly (ADVICE r5, sampling.py pregate boundary)."""
    import pytest

    from openstack_billing_from_db_spark.functions.hashing import py_hash64
    from openstack_billing_from_db_spark.operators.sampling import (
        token_budget_sample,
    )

    heavy = next(
        i for i in range(10_000) if py_hash64(f"t|{i}") >= int(0.9 * (1 << 60))
    )
    light = [
        i
        for i in range(10_000)
        if i != heavy and py_hash64(f"t|{i}") < int(0.5 * (1 << 60))
    ][:100]
    assert len(light) == 100
    docs = spark.createDataFrame(
        [(heavy, "s0", "w " * 150)] + [(i, "s0", "one") for i in light],
        "doc_id long, source string, text string",
    )
    # total = 250 tokens, budget 100, margin 1.5 → frac 0.6: heavy
    # (hash ≥ 0.9) gated out, all light (hash < 0.5) kept → kept_tok
    # lands EXACTLY on the budget, which is no longer good enough
    with pytest.raises(Exception) as ei:
        token_budget_sample(
            docs, budget_tokens=100, seed="t", pregate_margin=1.5
        ).collect()
    assert "not strictly above" in str(ei.value)


# --- DSIR importance resampling ----------------------------------------------


def test_dsir_ranks_target_like_docs_first(spark):
    """Raw docs sharing the target's vocabulary must outrank raw docs
    with disjoint vocabulary; weights are integer micro-units and ranks
    are dense from 1."""
    from pyspark.sql import functions as F

    from openstack_billing_from_db_spark.operators.sampling import (
        dsir_importance_topk,
    )

    rows = (
        # target corpus: heavy in 'alpha beta'
        [(i, "tgt", "alpha beta alpha beta") for i in range(10)]
        # raw pool: doc 100 looks like the target, 101 is off-distribution
        + [
            (100, "raw", "alpha beta alpha"),
            (101, "raw", "zig zag zog quux"),
            (102, "raw", "alpha zag"),
        ]
    )
    df = spark.createDataFrame(rows, "doc_id long, pool string, text string")
    out = dsir_importance_topk(
        df, F.col("pool") == "tgt", n_buckets=64, topk=3
    ).collect()
    by_rank = {r.rank: r.doc_id for r in out}
    assert by_rank[1] == 100  # most target-like
    assert by_rank[3] == 101  # least target-like
    ws = {r.doc_id: r.logw_micro for r in out}
    assert ws[100] > ws[102] > ws[101]
    assert all(isinstance(r.logw_micro, int) for r in out)

    import pytest

    with pytest.raises(ValueError):
        dsir_importance_topk(df, F.col("pool") == "tgt", n_buckets=0)


# --- Neyman allocation + Poisson bootstrap (round 6) -------------------------


def test_neyman_allocation_replays_integer_arithmetic(spark):
    import math

    from openstack_billing_from_db_spark.operators.sampling import (
        neyman_allocation,
    )

    rows = [("a", v) for v in (100, 100, 100)] \
         + [("b", v) for v in (0, 500, 1000)] \
         + [("c", v) for v in (200, 400)]
    df = spark.createDataFrame(rows, "source string, quality_micro long")
    out = {r.source: r for r in neyman_allocation(
        df, total_samples=100).collect()}
    # replay: exact moment sums, one rounded sqrt, floor allocations
    import collections
    groups = collections.defaultdict(list)
    for s, v in rows:
        groups[s].append(v)
    w, ns = {}, {}
    for s, vs in groups.items():
        n, ssum, ss = len(vs), sum(vs), sum(v * v for v in vs)
        sd = math.floor(math.sqrt(max(ss / n - (ssum / n) * (ssum / n), 0.0)) + 0.5)
        assert out[s].sd_value == sd
        assert out[s].mean_value == ssum // n
        assert out[s].n_docs == n
        w[s], ns[s] = n * sd, n
    wt, nt = sum(w.values()), sum(ns.values())
    for s in groups:
        assert out[s].alloc_neyman == 100 * w[s] // max(wt, 1)
        assert out[s].alloc_prop == 100 * ns[s] // nt
    # zero-variance stratum gets nothing from Neyman, something from prop
    assert out["a"].alloc_neyman == 0
    assert out["a"].alloc_prop > 0


def test_neyman_all_constant_strata_guarded(spark):
    from openstack_billing_from_db_spark.operators.sampling import (
        neyman_allocation,
    )

    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 7)], "source string, quality_micro long"
    )
    out = neyman_allocation(df, total_samples=10).collect()
    assert all(r.alloc_neyman == 0 for r in out)  # wt=0 -> guarded, no crash
    assert sum(r.alloc_prop for r in out) <= 10


def test_poisson_bootstrap_thresholds_are_poisson1_cdf():
    import math

    from openstack_billing_from_db_spark.operators.sampling import (
        poisson_bootstrap_thresholds,
    )

    ts = poisson_bootstrap_thresholds()
    assert ts == sorted(ts) and len(ts) == 8
    cdf = 0.0
    for k, t in enumerate(ts):
        cdf += math.exp(-1.0) / math.factorial(k)
        assert abs(t / (1 << 60) - cdf) < 1e-9
    # mean of the truncated draw stays ~1 (inverse-CDF correctness)
    probs = [math.exp(-1.0) / math.factorial(k) for k in range(8)]
    mean = sum(k * p for k, p in enumerate(probs)) + 8 * (1 - sum(probs))
    assert abs(mean - 1.0) < 1e-4


def test_poisson_bootstrap_ci_shape_and_determinism(spark, sf_dir):
    from openstack_billing_from_db_spark.operators.sampling import (
        poisson_bootstrap_mean_ci,
    )
    from openstack_billing_from_db_spark.operators.text import (
        quality_score_micro,
    )
    from openstack_billing_from_db_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    scored = load_table(spark, sf_dir, "documents").select(
        "doc_id", quality_score_micro(F.col("text")).alias("quality_micro")
    )
    a = poisson_bootstrap_mean_ci(scored, n_replicas=40).collect()
    b = poisson_bootstrap_mean_ci(scored, n_replicas=40).collect()
    assert a == b and len(a) == 1
    r = a[0]
    assert r.n_replicas == 40
    assert r.ci_lo <= r.ci_hi
    # the interval brackets the point estimate on a real corpus
    assert r.ci_lo <= r.point_mean <= r.ci_hi
    assert 0 < r.point_mean < 1_000_000


def test_bootstrap_finalize_guards_fire_on_malformed_state(spark):
    """ADVICE r7: the replica-count/ids assert must fire on EVERY
    malformed merged state — including one missing the b = -1 total
    row (previously the check rode a CASE branch that never evaluated
    then), and a heterogeneous-B merge whose 41 distinct ids pass a
    bare count check."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from openstack_billing_from_db_spark.operators.sampling import (
        bootstrap_finalize,
    )

    def rows(bs):
        return spark.createDataFrame(
            [(b, 100 + b, 10) for b in bs], "b long, s long, n long"
        )

    # well-formed: {-1, 0..3} with n_replicas=4 finalizes
    ok = bootstrap_finalize(rows(range(-1, 4)), n_replicas=4).collect()
    assert len(ok) == 1 and ok[0].n_replicas == 4

    # missing the b = -1 total row: must RAISE, not return nulls
    with pytest.raises((Py4JJavaError, PythonException, Exception)) as e1:
        bootstrap_finalize(rows(range(0, 5)), n_replicas=4).collect()
    assert "replica ids" in str(e1.value)

    # heterogeneous-B merge: B=4 state union a stray b=5 replica gives
    # 6 distinct ids — count matches n_replicas=5 but max b = 5 != 4
    with pytest.raises((Py4JJavaError, PythonException, Exception)) as e2:
        bootstrap_finalize(
            rows([-1, 0, 1, 2, 3, 5]), n_replicas=5
        ).collect()
    assert "replica ids" in str(e2.value)

    # wrong caller B against a well-formed state still raises
    with pytest.raises((Py4JJavaError, PythonException, Exception)) as e3:
        bootstrap_finalize(rows(range(-1, 4)), n_replicas=40).collect()
    assert "replica ids" in str(e3.value)

    # degenerate 1-row state where NO output CASE branch fires (no
    # b = -1, no rank-3, no rank-(cnt-1) row): the fold must still
    # evaluate per row — pins that Catalyst does not collapse the
    # assert into the branch-gated CASE expressions
    with pytest.raises((Py4JJavaError, PythonException, Exception)) as e4:
        bootstrap_finalize(rows([0]), n_replicas=0).collect()
    assert "replica ids" in str(e4.value)
