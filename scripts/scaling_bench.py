"""Two-point scaling curve for the headline queries: sf0.1 vs a 10×
replica (≈ sf1). Prints one JSON line per scale with per-query seconds
and the observed time ratio — the empirical check behind PLANS.md's
"would this plan survive a scale-up" claims (VERDICT item 9).

Usage: python scripts/scaling_bench.py [scaled_dir]
(generate the scaled dir first: python scripts/make_scale_data.py 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openstack_billing_from_db_spark.operators.caching import (
    release_operator_caches,
)
from openstack_billing_from_db_spark.registry import all_queries
from openstack_billing_from_db_spark.session import get_spark

# batch-heavy queries spanning the engine's hot paths: windowed
# sessionization, grouped billing agg, global percentile sort, session
# windows, banded minhash/simhash joins, adaptive-LSH embedding dedup
QUERIES = (
    "q01_billing_invoice",
    "q04_state_intervals",
    "q24_distribution_stats",
    "q28_gap_sessions",
    "q35_minhash_near_dups",
    "q37_simhash_near_dups",
    "q40_embedding_near_dups",
    "q40_adaptive",
    # round-3 operators: map-side k-means assignment, gram-explode
    # repetition counters, count-join LM scoring
    "q73_kmeans_clusters",
    "q74_repetition_stats",
    "q76_lm_quality",
    # span inverted-index build, BPE training loop, composed filter
    "q80_span_dedup",
    "q78_bpe_train",
    "q81_quality_filter",
    # round-4 curation operators: map-side chunking/scoring, tf-idf
    # double agg + window, bloom-prefiltered decontamination, min-packed
    # segment dedup, banded incremental index join
    "q89_doc_chunks",
    "q90_tfidf_topk",
    "q91_bloom_decontaminate",
    "q92_segment_dedup",
    "q93_quality_classifier",
    "q94_incremental_dedup",
    # iterative joins over the purchase graph (edge extraction scales
    # with the replicas; the derived graph itself is key-space-bound)
    "q95_pagerank",
    # round-4 sketch/sampling/encoder: distinct-reduce + k-min window,
    # TakeOrdered top-k sample, vocab-merge + broadcast-join encode
    "q98_kmv_distinct",
    "q99_priority_sample",
    "q100_bpe_encode",
    "q101_countmin_heavy_hitters",
    "q102_kmv_set_overlap",
)


def _q40_adaptive(spark, sf_dir):
    """q40's operator with the adaptive-width default (n_planes=None)
    instead of the oracle-pinned 8 planes — the scale-path contrast for
    the fixed-width hazard VERDICT.md flagged."""
    from openstack_billing_from_db_spark.operators.similarity import (
        embedding_near_duplicates,
    )
    from openstack_billing_from_db_spark.sources.tables import load_table

    return embedding_near_duplicates(
        load_table(spark, sf_dir, "embeddings"), threshold=0.35, dims=64
    )


def run_scale(spark, queries, sf_dir: str) -> dict[str, float]:
    times = {}
    for name in QUERIES:
        fn = _q40_adaptive if name == "q40_adaptive" else queries[name]
        # noop sink, NOT count(): counting an outer-join-shaped result
        # lets Catalyst prune the join against a key-distinct aggregate
        # (hit by q125 — 1.8s "measured" vs 29.6s real); noop forces the
        # full plan like bench.py
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        release_operator_caches()
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        times[name] = round(time.monotonic() - t0, 3)
        release_operator_caches()
        spark.catalog.clearCache()
    return times


def _isolated_time(name: str, sf_dir: str) -> float:
    """One (query, scale) measurement in a FRESH interpreter+JVM. In-
    session sweeps showed 5-9x inflated ratios for late-running queries
    (accumulated session state); isolation trades ~8s of JVM startup per
    point for numbers that don't depend on sweep order."""
    import subprocess

    code = f"""
import time
from openstack_billing_from_db_spark.session import get_spark
from openstack_billing_from_db_spark.registry import all_queries
from openstack_billing_from_db_spark.operators.caching import release_operator_caches
import scripts.scaling_bench as sb
spark = get_spark(app_name='scaling-probe')
spark.sparkContext.setLogLevel('ERROR')
fn = sb._q40_adaptive if {name!r} == 'q40_adaptive' else all_queries()[{name!r}]
fn(spark, {sf_dir!r}).write.mode('overwrite').format('noop').save()
release_operator_caches(); spark.catalog.clearCache()
t0 = time.monotonic()
fn(spark, {sf_dir!r}).write.mode('overwrite').format('noop').save()
print('ISOLATED_SECONDS', round(time.monotonic() - t0, 3))
print('ISOLATED_ROWS', fn(spark, {sf_dir!r}).count())
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    secs = rows = None
    for line in out.stdout.splitlines():
        if line.startswith("ISOLATED_SECONDS"):
            secs = float(line.split()[1])
        elif line.startswith("ISOLATED_ROWS"):
            rows = int(line.split()[1])
    if secs is None:
        raise RuntimeError(f"{name}@{sf_dir} failed:\n{out.stderr[-2000:]}")
    return secs, rows


def main(scaled_dir: str, isolated: bool = False, subset: tuple = ()) -> None:
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    label = os.path.basename(scaled_dir.rstrip("/"))
    names = tuple(subset) or QUERIES
    if isolated:
        base_pairs = {n: _isolated_time(n, base_dir) for n in names}
        scaled_pairs = {n: _isolated_time(n, scaled_dir) for n in names}
        base = {n: s for n, (s, _) in base_pairs.items()}
        scaled = {n: s for n, (s, _) in scaled_pairs.items()}
        rows = {
            n: {"base": base_pairs[n][1], "scaled": scaled_pairs[n][1]}
            for n in names
        }
        ratios = {k: round(scaled[k] / base[k], 2) for k in base}
        print(json.dumps({"sf": "base(sf0.1)", "queries": base}))
        print(json.dumps({"sf": f"scaled({label})", "queries": scaled}))
        print(json.dumps({f"time_ratio_at_{label}_data": ratios, "output_rows": rows}))
        return
    else:
        spark = get_spark(app_name="scaling-bench")
        queries = all_queries()
        # first sweep is warmup only (whole-stage-codegen JIT dominates
        # the first execution of each plan shape and would inflate the
        # base numbers ~3-4x); timed sweeps run on a fully warmed JVM
        run_scale(spark, queries, base_dir)
        base = run_scale(spark, queries, base_dir)
        scaled = run_scale(spark, queries, scaled_dir)
    ratios = {k: round(scaled[k] / base[k], 2) for k in base}
    print(json.dumps({"sf": "base(sf0.1)", "queries": base}))
    print(json.dumps({"sf": f"scaled({label})", "queries": scaled}))
    print(json.dumps({f"time_ratio_at_{label}_data": ratios}))


if __name__ == "__main__":
    subset = ()
    args = []
    for a in sys.argv[1:]:
        if a == "--isolated":
            continue
        if a.startswith("--queries="):
            subset = tuple(a.split("=", 1)[1].split(","))
        else:
            args.append(a)
    main(
        args[0] if args else
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "x10"),
        isolated="--isolated" in sys.argv,
        subset=subset,
    )
