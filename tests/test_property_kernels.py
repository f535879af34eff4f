"""Property-based checks for the round-4/5 kernels against INDEPENDENT
pure-Python simulators (the randomized complement to the oracle-parity
harness, which pins one dataset): HyperLogLog register construction and
merge, blocked edit-distance soundness/completeness-within-blocks,
Jensen-Shannon bounds and value, and floor-binned quantile invariants
over signed values."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from openstack_billing_from_db_spark.operators.quantiles import (
    histogram_quantiles,
)
from openstack_billing_from_db_spark.operators.sketch import (
    HLL_B,
    HLL_M,
    HLL_REM_BITS,
    hll_distinct,
    hll_merge,
    hll_registers,
)


# --- HyperLogLog vs an independent Python HLL --------------------------------


def _py_hll_registers(values):
    """Independent simulator: same md5-derived 52-bit hash, low-b-bits
    register, leading-rank of the remaining bits."""
    regs: dict[int, int] = {}
    for v in set(values):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16)
        reg = h % HLL_M
        h2 = h >> HLL_B
        rho = HLL_REM_BITS + 1 - (h2.bit_length() if h2 else 0)
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


values_lists = st.lists(
    st.integers(0, 500), min_size=1, max_size=120
)


@settings(max_examples=10, deadline=None)
@given(vals=values_lists, split=st.integers(0, 120))
def test_hll_registers_match_python_and_merge(spark, vals, split):
    rows = [("g", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r.reg, r.rho)
        for r in hll_registers(df, group_col="g", value_col="v").collect()
    }
    want = set(_py_hll_registers(vals).items())
    assert got == want

    # merge law under an arbitrary split
    a = vals[: min(split, len(vals))] or vals[:1]
    b = vals[min(split, len(vals)) :] or vals[-1:]
    pa = hll_registers(
        spark.createDataFrame([("g", v) for v in a], "g string, v long"),
        group_col="g",
        value_col="v",
    )
    pb = hll_registers(
        spark.createDataFrame([("g", v) for v in b], "g string, v long"),
        group_col="g",
        value_col="v",
    )
    merged = {
        (r.reg, r.rho)
        for r in hll_merge(pa.union(pb), group_col="g").collect()
    }
    assert merged == set(_py_hll_registers(a + b).items())


@settings(max_examples=8, deadline=None)
@given(vals=values_lists)
def test_hll_estimate_matches_python_formula(spark, vals):
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    row = hll_distinct(df, group_col="g", value_col="v").collect()[0]
    regs = _py_hll_registers(vals)
    m = HLL_M
    z = (m - len(regs)) + sum(2.0 ** -r for r in regs.values())
    raw = 0.709 * m * m / z
    if raw <= 2.5 * m and len(regs) < m:
        est = m * math.log(m / (m - len(regs)))
    else:
        est = raw
    assert row.n_distinct_exact == len(set(vals))
    assert row.n_registers_used == len(regs)
    assert abs(row.est_milli - math.floor(est * 1000 + 0.5)) <= 1


# --- blocked edit distance ----------------------------------------------------


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _py_norm(s: str) -> str:
    import re

    return re.sub(" +", " ", re.sub("[^a-z0-9 ]", "", s.lower())).strip()


texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=40),
    min_size=2,
    max_size=25,
)


@settings(max_examples=10, deadline=None)
@given(docs=texts)
def test_edit_distance_pairs_sound_and_block_complete(spark, docs):
    from openstack_billing_from_db_spark.operators.dedup import (
        edit_distance_near_duplicates,
    )

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.doc_a, r.doc_b): r.edit_distance
        for r in edit_distance_near_duplicates(
            df, prefix_len=4, len_bucket=8, max_block=10, cap_chars=24,
            max_distance=3,
        ).collect()
    }
    # independent expectation: block, cap, compare
    keyed = {}
    for did, text in rows:
        n = _py_norm(text)
        keyed[did] = (n[:24], n[:4], len(n) // 8)
    from collections import Counter

    blocks = Counter((p, l) for _, p, l in keyed.values())
    want = {}
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            ca, pa, la = keyed[a]
            cb, pb, lb = keyed[b]
            if (pa, la) != (pb, lb) or blocks[(pa, la)] > 10:
                continue
            d = _py_lev(ca, cb)
            if d <= 3:
                want[(a, b)] = d
    assert out == want


# --- Jensen-Shannon bounds and value -----------------------------------------


corpus = st.lists(
    st.tuples(st.sampled_from(["s0", "s1"]), st.text(alphabet="ab c", min_size=1, max_size=30)),
    min_size=2,
    max_size=20,
).filter(
    lambda rows: len({g for g, t in rows if _py_norm(t).split()}) == 2
    and all(
        any(_py_norm(t).split() for g2, t in rows if g2 == g)
        for g in ("s0", "s1")
    )
)


@settings(max_examples=10, deadline=None)
@given(rows=corpus)
def test_js_divergence_bounds_and_value(spark, rows):
    from openstack_billing_from_db_spark.plans.sketch_queries import (
        q121_js_divergence,
    )
    from openstack_billing_from_db_spark.sources import tables

    df = spark.createDataFrame(
        [(i, t, g) for i, (g, t) in enumerate(rows)],
        "doc_id long, text string, source string",
    )
    # drive the operator body directly (bypass the parquet loader)
    import openstack_billing_from_db_spark.plans.sketch_queries as sq

    orig = tables.load_table
    try:
        tables.load_table = lambda spark, sf_dir, name: df  # noqa: ARG005
        sq_load = sq.load_table
        sq.load_table = lambda spark, sf_dir, name: df  # noqa: ARG005
        out = {
            (r.source_a, r.source_b): r.jsd_micro
            for r in q121_js_divergence(spark, "unused").collect()
        }
    finally:
        tables.load_table = orig
        sq.load_table = sq_load

    # independent numpy-free JSD
    from collections import Counter

    dist = {}
    for g in ("s0", "s1"):
        words = [
            w
            for g2, t in rows
            if g2 == g
            for w in _py_norm(t).split()
        ]
        c = Counter(words)
        n = sum(c.values())
        dist[g] = {w: k / n for w, k in c.items()}
    terms = set(dist["s0"]) | set(dist["s1"])
    jsd = 0.0
    for w in terms:
        p, q = dist["s0"].get(w, 0.0), dist["s1"].get(w, 0.0)
        mwd = (p + q) / 2
        if p:
            jsd += 0.5 * p * math.log(p / mwd)
        if q:
            jsd += 0.5 * q * math.log(q / mwd)
    got = out[("s0", "s1")]
    assert -1 <= got <= math.log(2) * 1e6 + 1
    assert abs(got - math.floor(jsd * 1e6 + 0.5)) <= 2


# --- floor-binned quantiles over signed values -------------------------------


@settings(max_examples=12, deadline=None)
@given(
    vals=st.lists(st.integers(-500, 500), min_size=1, max_size=80),
    w=st.integers(1, 50),
)
def test_quantile_floor_invariants_signed(spark, vals, w):
    df = spark.createDataFrame([("g", v) for v in vals], "g string, n long")
    r = histogram_quantiles(
        df, group_col="g", value_col="n", bin_width=w,
        p_micro=(250_000, 750_000),
    ).collect()[0]
    for lbl in ("p25", "p75"):
        est, exact = r[f"{lbl}_est"], r[f"{lbl}_exact"]
        assert est >= exact
        assert est - exact < w


# --- exact set-similarity join vs Python brute force -------------------------


def _py_set_similarity(texts, tb, n=3):
    """Independent brute force: distinct word n-shingle sets, exact
    Jaccard over ALL pairs (no prefix/length pruning)."""
    sets = {}
    for i, t in enumerate(texts):
        w = [x for x in t.strip().split(" ") if x]
        sh = {" ".join(w[j : j + n]) for j in range(len(w) - n + 1)}
        if sh:
            sets[i] = sh
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * 10000 >= tb * union:
                out[(a, b)] = inter / union
    return out


_ssj_docs = st.lists(
    st.lists(st.sampled_from("a b c d e".split()), min_size=0, max_size=10).map(
        " ".join
    ),
    min_size=2,
    max_size=10,
)


@settings(max_examples=10, deadline=None)
@given(docs=_ssj_docs, tb=st.sampled_from([3000, 5000, 6000, 8000, 10000]))
def test_set_similarity_join_matches_brute_force(spark, docs, tb):
    """The prefix + length filters must be LOSSLESS: the pruned join
    returns exactly the brute-force pair set at every threshold."""
    from openstack_billing_from_db_spark.operators.dedup import (
        set_similarity_join,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in set_similarity_join(df, threshold_bp=tb).collect()
    }
    want = _py_set_similarity(docs, tb)
    assert set(got) == set(want)
    for pair, j in want.items():
        assert abs(got[pair] - j) < 1e-12


# --- two-pass (prefix + suffix) edit-distance blocking -----------------------


def test_edit_distance_two_pass_catches_prefix_edits(spark):
    """A pair whose only edit sits INSIDE the prefix key is invisible to
    the prefix pass but caught by the suffix pass (and vice versa); a
    pair caught by both passes appears exactly once."""
    from openstack_billing_from_db_spark.operators.dedup import (
        edit_distance_near_duplicates,
        edit_distance_near_duplicates_two_pass,
    )

    b1 = "abcdefghij" * 4
    b2 = "klmnopqrst" * 4
    b3 = "uvwxyz0123" * 4
    docs = spark.createDataFrame(
        [
            (1, b1),
            (2, b1[:2] + "z" + b1[3:]),   # edit at char 3 → inside prefix(16)
            (3, b2),
            (4, b2[:-1] + "z"),           # edit at last char → inside suffix(16)
            (5, b3),
            (6, b3[:20] + "z" + b3[21:]), # middle edit → both passes catch
        ],
        "doc_id long, text string",
    )
    kw = dict(prefix_len=16, len_bucket=32, max_block=64, cap_chars=96,
              max_distance=8)
    prefix_only = {
        (r.doc_a, r.doc_b)
        for r in edit_distance_near_duplicates(docs, **kw).collect()
    }
    suffix_only = {
        (r.doc_a, r.doc_b)
        for r in edit_distance_near_duplicates(
            docs, block_on="suffix", **kw
        ).collect()
    }
    rows = edit_distance_near_duplicates_two_pass(docs, **kw).collect()
    both = {(r.doc_a, r.doc_b) for r in rows}
    assert (1, 2) not in prefix_only and (1, 2) in suffix_only
    assert (3, 4) in prefix_only and (3, 4) not in suffix_only
    assert both == {(1, 2), (3, 4), (5, 6)}
    assert len(rows) == 3  # the doubly-caught (5, 6) deduped
    assert all(r.edit_distance == 1 for r in rows)


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=30,
    ),
    budget=st.integers(min_value=1, max_value=120),
    margin=st.sampled_from([1.5, 2.0, 4.0]),
)
def test_token_prefix_gate_identical_or_loud(spark, data, budget, margin):
    """The shared admission kernel's contract (token_budget_sample AND
    mixture_epoch_sample ride it): for ANY corpus/budget/margin, the
    hash-prefix pregate either returns exactly the exact-path epoch or
    raises — it never silently shrinks the admitted set."""
    import pytest

    from openstack_billing_from_db_spark.operators.sampling import (
        token_budget_sample,
    )

    rows = [
        (i, src, "w " * n_tok) for i, (src, n_tok) in enumerate(data)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    exact = sorted(
        tuple(r)
        for r in token_budget_sample(
            docs, budget_tokens=budget, seed="prop"
        ).collect()
    )
    try:
        gated = sorted(
            tuple(r)
            for r in token_budget_sample(
                docs, budget_tokens=budget, seed="prop", pregate_margin=margin
            ).collect()
        )
    except ValueError as e:
        assert "pregate_margin" in str(e)
        return
    assert gated == exact


@given(
    n=st.integers(0, 10**8),
    bits=st.sampled_from([32, 56, 64, 72, 128]),
    mh=st.integers(1, 8),
    mmb=st.sampled_from([16, 64, 128, 512]),
)
@settings(max_examples=200, deadline=None)
def test_tune_hamming_band_bits_invariants(n, bits, mh, mmb):
    """Whatever the tuner returns satisfies BOTH constraints (pigeonhole
    band count and expected occupancy); a refusal means NO width in
    range satisfies them — never a silent saturating fallback."""
    from openstack_billing_from_db_spark.operators.dedup import (
        tune_hamming_band_bits,
    )

    def feasible(bb: int) -> bool:
        return bits // bb > mh and n <= mmb * (1 << bb)

    try:
        bb = tune_hamming_band_bits(
            n, bits=bits, max_hamming=mh, max_mean_bucket=mmb
        )
    except ValueError:
        assert not any(
            feasible(w) for w in range(1, min(bits // (mh + 1), 62) + 1)
        )
    else:
        assert feasible(bb)
        # widest-wins: no wider admissible width exists
        assert not any(
            feasible(w)
            for w in range(bb + 1, min(bits // (mh + 1), 62) + 1)
        )
