"""pagerank_micro (operators/graph.py): hand-computed fixed points on
tiny graphs; oracle parity for q95 is covered by test_oracle_parity."""

from __future__ import annotations

from openstack_billing_from_db_spark.operators.graph import (
    PR_BASE,
    PR_INIT,
    pagerank_micro,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _run(spark, pairs, iterations=3):
    return {
        r.node: r.pr
        for r in pagerank_micro(
            _edges(spark, pairs), iterations=iterations
        ).collect()
    }


def test_symmetric_pair_is_a_fixpoint(spark):
    # a<->b: each sends its full score each round; 150000 + 850000 = 1e6
    pr = _run(spark, [("a", "b"), ("b", "a")])
    assert pr == {"a": PR_INIT, "b": PR_INIT}


def test_directed_edge_hand_computed(spark):
    # a->b only. iter1: a=BASE, b=150000+850000=1000000
    # iter2+: b = 150000 + (150000*17)//20 = 277500 (a's score damped)
    pr = _run(spark, [("a", "b")])
    assert pr["a"] == PR_BASE
    assert pr["b"] == PR_BASE + (PR_BASE * 17) // 20 == 277500


def test_cycle_is_a_fixpoint(spark):
    pr = _run(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert set(pr.values()) == {PR_INIT}


def test_hub_accumulates_more_than_spokes(spark):
    # star: three spokes all pointing at hub (and hub pointing back, so
    # spokes aren't all-equal-base); hub must outrank every spoke
    pairs = [("s1", "h"), ("s2", "h"), ("s3", "h"), ("h", "s1")]
    pr = _run(spark, pairs)
    assert pr["h"] > max(pr["s1"], pr["s2"], pr["s3"])


def test_share_is_split_across_out_edges(spark):
    # a->b and a->c: each receives floor(pr_a / 2)
    pr = _run(spark, [("a", "b"), ("a", "c")], iterations=1)
    expected = PR_BASE + ((PR_INIT // 2) * 17) // 20
    assert pr["b"] == expected and pr["c"] == expected
