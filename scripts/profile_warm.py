"""Per-stage time attribution for one or more registered queries.

Runs each named query solo (plan build + noop-sink execution) in a
fresh session with event logging on, then parses the event log and
prints, per job: submission order, job duration, and each stage's name,
task count, executor-run/CPU time, shuffle read/write bytes and
records. This is the guide-§1 "where does the time go" view the UI
would give — the UI is disabled in this sandbox, the event log isn't.

Usage: python scripts/profile_warm.py q112_ivf_pq_topk [more...]
       [--sf /root/testdata/sf0.1] [--parse-only]
Must run with cwd=/root/repo.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

EVDIR = "/tmp/spark_graft_events"


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    parse_only = "--parse-only" in args
    if parse_only:
        args.remove("--parse-only")
    names = args

    import shutil

    if not parse_only:
        shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    if not parse_only:
        _run(names, sf_dir)

    _parse_and_report()
    return 0


def _run(names: list[str], sf_dir: str) -> None:
    from openstack_billing_from_db_spark.registry import all_queries
    from openstack_billing_from_db_spark.session import get_spark

    queries = all_queries()
    spark = get_spark(
        app_name="profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )

    for name in names:
        # warm once at sf0.001 (codegen/scan caches), like bench.py
        try:
            queries[name](spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception:
            pass
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"PROFILE:{name}#cold")
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"PROFILE:{name}#warm")
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        wall2 = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        print(f"\n##### {name}: cold {wall:.2f}s warm {wall2:.2f}s")
    spark.stop()


def _parse_and_report() -> None:
    # -- parse the event log ------------------------------------------------
    entries = [
        os.path.join(EVDIR, f)
        for f in (os.listdir(EVDIR) if os.path.isdir(EVDIR) else ())
        if not f.startswith(".")
    ]
    if not entries:
        raise SystemExit(f"no event log found under {EVDIR} — run without --parse-only first")
    top = entries[0]
    if os.path.isdir(top):  # eventlog v2 rolling layout: a dir of parts
        evfiles = sorted(
            os.path.join(top, f)
            for f in os.listdir(top)
            if f.startswith("events_")
        )
    else:
        evfiles = [top]
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}

    def _empty_stage() -> dict:
        return {
            "name": "?",
            "ntask": 0,
            "wall": 0.0,
            "run": 0.0,
            "cpu": 0.0,
            "sr": 0,
            "sw": 0,
            "srr": 0,
            "swr": 0,
            "in": 0,
        }

    def _lines():
        for p in evfiles:
            if p.endswith(".zstd"):
                import io

                import zstandard

                with open(p, "rb") as raw:
                    reader = zstandard.ZstdDecompressor().stream_reader(raw)
                    yield from io.TextIOWrapper(reader, encoding="utf-8")
            else:
                with open(p) as fh:
                    yield from fh

    for line in _lines():
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "desc": ev.get("Properties", {}).get(
                    "spark.job.description", ""
                ),
                "t0": ev["Submission Time"],
                "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub, comp = si.get("Submission Time"), si.get("Completion Time")
            s = stages.setdefault(sid, _empty_stage())
            s["name"] = si["Stage Name"].split("\n")[0][:90]
            s["ntask"] = si["Number of Tasks"]
            s["wall"] = ((comp - sub) / 1000.0) if sub and comp else 0.0
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            tm = ev.get("Task Metrics") or {}
            s = stages.setdefault(sid, _empty_stage())
            s["run"] += tm.get("Executor Run Time", 0) / 1000.0
            s["cpu"] += tm.get("Executor CPU Time", 0) / 1e9
            srm = tm.get("Shuffle Read Metrics", {})
            s["sr"] += srm.get("Local Bytes Read", 0) + srm.get(
                "Remote Bytes Read", 0
            )
            s["srr"] += srm.get("Total Records Read", 0)
            swm = tm.get("Shuffle Write Metrics", {})
            s["sw"] += swm.get("Shuffle Bytes Written", 0)
            s["swr"] += swm.get("Shuffle Records Written", 0)
            s["in"] += tm.get("Input Metrics", {}).get("Bytes Read", 0)

    cur = None
    for jid in sorted(jobs):
        j = jobs[jid]
        desc = j["desc"]
        if not desc.startswith("PROFILE:"):
            continue
        if desc != cur:
            cur = desc
            print(f"\n===== {desc}")
        dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
        print(f"job {jid}: {dur:7.2f}s")
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if not s or (s["wall"] == 0 and s["run"] == 0):
                continue  # skipped stage (exchange reuse)
            print(
                f"  stage {sid:4d} [{s['ntask']:3d}t] wall {s['wall']:6.2f}s "
                f"run {s['run']:6.2f}s cpu {s['cpu']:6.2f}s "
                f"sr {s['sr'] / 1e6:7.1f}MB/{s['srr']:>9d}r "
                f"sw {s['sw'] / 1e6:7.1f}MB/{s['swr']:>9d}r "
                f"in {s['in'] / 1e6:7.1f}MB  {s['name']}"
            )


if __name__ == "__main__":
    raise SystemExit(main())
