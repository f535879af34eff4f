"""bench.py output contract: the driver tail-captures stdout and parses
JSON — the LAST line must always be a short parseable summary (round 3
lost its headline to a truncated multi-KB line), and the full per-query
line must precede it."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_parseable_two_line_contract():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_QUERIES="q22_scalar_functions,q34_dedup_exact",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [
        json.loads(line)
        for line in out.stdout.splitlines()
        if line.startswith("{")
    ]
    assert len(json_lines) >= 3
    full, summary = json_lines[0], json_lines[-1]
    # full line carries the per-query map
    assert set(full["queries"]) == {"q22_scalar_functions", "q34_dedup_exact"}
    # middle lines: tail-safe per-query chunks (VERDICT r12 Next #2) —
    # each ≤1.5 KB, and together they reassemble the full map exactly
    chunks = json_lines[1:-1]
    assert chunks, "per_query_chunk lines missing"
    merged: dict[str, float] = {}
    for i, c in enumerate(chunks):
        assert c["metric"] == "per_query_chunk"
        assert c["chunk"] == i and c["n_chunks"] == len(chunks)
        assert len(json.dumps(c)) <= 1536
        merged.update(c["queries"])
    assert merged == full["queries"]
    # final line is the short always-parseable summary
    assert summary["metric"] == "sum_query_wall_time"
    assert summary["n_queries"] == 2 and summary["n_failed"] == 0
    assert summary["value"] is not None and summary["value"] > 0
    assert "queries" not in summary  # short by construction
