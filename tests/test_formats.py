"""Source/sink format coverage beyond parquet: ORC and JSON roundtrips
preserve the invoice result exactly; approximate aggregates land within
tolerance of exact (rows-only operators — approximations can't be
oracle-hashed across engines by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openstack_billing_from_db_spark.plans.billing import (
    testdata_invoice as _invoice,  # underscore: keep pytest from collecting it
)
from openstack_billing_from_db_spark.sources.tables import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    inv = _invoice(spark, sf_dir)
    path = str(tmp_path / "inv_orc")
    inv.write.mode("overwrite").orc(path)
    assert _rows(spark.read.orc(path)) == _rows(inv)


def test_json_roundtrip(spark, sf_dir, tmp_path):
    inv = _invoice(spark, sf_dir)
    path = str(tmp_path / "inv_json")
    inv.write.mode("overwrite").json(path)
    back = spark.read.schema(inv.schema).json(path)
    assert _rows(back) == _rows(inv)


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    inv = _invoice(spark, sf_dir)
    path = str(tmp_path / "inv_csv")
    inv.write.mode("overwrite").option("header", "true").csv(path)
    back = spark.read.schema(inv.schema).option("header", "true").csv(path)
    assert _rows(back) == _rows(inv)


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5).alias("p50_approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05
    assert abs(row.p50_approx - row.p50_exact) / row.p50_exact < 0.05


def test_output_file_count_control(spark, sf_dir, tmp_path):
    """repartition(n) controls output file fan-out (the knob that sizes
    files for downstream scans at scale)."""
    import glob

    inv = _invoice(spark, sf_dir)
    p4 = str(tmp_path / "four")
    inv.repartition(4).write.mode("overwrite").parquet(p4)
    assert len(glob.glob(f"{p4}/part-*.parquet")) == 4
    p1 = str(tmp_path / "one")
    inv.coalesce(1).write.mode("overwrite").parquet(p1)
    assert len(glob.glob(f"{p1}/part-*.parquet")) == 1


def test_compact_parquet_shrinks_files_preserves_data(spark, sf_dir, tmp_path):
    from openstack_billing_from_db_spark.sources.maintenance import compact_parquet
    from openstack_billing_from_db_spark.sources.tables import load_table

    p = str(tmp_path / "frag")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(24).write.mode("overwrite").parquet(p)  # fragment: 24 files
    before = {tuple(r) for r in spark.read.parquet(p).collect()}

    stats = compact_parquet(spark, p, target_file_mb=64)
    assert stats["files_before"] == 24
    assert stats["files_after"] < 24
    after = {tuple(r) for r in spark.read.parquet(p).collect()}
    assert after == before
    assert stats["rows"] == len(before)


def test_compact_parquet_noop_on_single_file(spark, sf_dir, tmp_path):
    from openstack_billing_from_db_spark.sources.maintenance import compact_parquet
    from openstack_billing_from_db_spark.sources.tables import load_table

    p = str(tmp_path / "single")
    load_table(spark, sf_dir, "nation").coalesce(1).write.mode("overwrite").parquet(p)
    stats = compact_parquet(spark, p)
    assert stats["files_before"] == stats["files_after"] == 1
    assert stats["rows"] is None  # untouched


def test_compact_parquet_rewrite_failure_keeps_original(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A failed rewrite (row-count mismatch) must leave the original
    table byte-identical and clean up its temp directory."""
    import os

    import pytest

    from openstack_billing_from_db_spark.sources import maintenance
    from openstack_billing_from_db_spark.sources.tables import load_table

    p = str(tmp_path / "frag_fail")
    load_table(spark, sf_dir, "nation").repartition(3).write.mode(
        "overwrite"
    ).parquet(p)
    before = {tuple(r) for r in spark.read.parquet(p).collect()}

    concrete = type(spark.read.parquet(p))  # classic DataFrame subclass
    real_count = concrete.count
    calls = []

    def bad_count(self):
        calls.append(1)
        # first count is the source row-count; fudge only the re-read of
        # the rewrite so the verification mismatch fires
        return real_count(self) + (1 if len(calls) > 1 else 0)

    monkeypatch.setattr(concrete, "count", bad_count)
    with pytest.raises(RuntimeError, match="row-count mismatch"):
        maintenance.compact_parquet(spark, p, min_files=2)
    monkeypatch.undo()

    assert {tuple(r) for r in spark.read.parquet(p).collect()} == before
    siblings = [d for d in os.listdir(tmp_path) if d.startswith("compact")]
    assert siblings == []  # tmp cleaned, no .old left behind


def test_compact_parquet_swap_failure_restores_original(
    spark, sf_dir, tmp_path, monkeypatch
):
    """If the final rename of the rewrite into place fails, the original
    directory must be restored intact (rename-aside swap, ADVICE r3)."""
    import os

    import pytest

    from openstack_billing_from_db_spark.sources import maintenance
    from openstack_billing_from_db_spark.sources.tables import load_table

    p = str(tmp_path / "frag_swap")
    load_table(spark, sf_dir, "nation").repartition(3).write.mode(
        "overwrite"
    ).parquet(p)
    before = {tuple(r) for r in spark.read.parquet(p).collect()}

    real_rename = os.rename
    fired = []

    def flaky_rename(src, dst):
        # fail only the tmp->path rename; the restore (old->path) that
        # follows must go through
        if not fired and os.path.basename(src).startswith(
            "compact_"
        ) and not os.path.basename(src).startswith("compact_old_"):
            fired.append(1)
            raise OSError("injected: rename of rewrite into place failed")
        return real_rename(src, dst)

    monkeypatch.setattr(maintenance.os, "rename", flaky_rename)
    with pytest.raises(OSError, match="injected"):
        maintenance.compact_parquet(spark, p, min_files=2)
    monkeypatch.undo()

    # original restored at its path, readable, byte-identical rows
    assert {tuple(r) for r in spark.read.parquet(p).collect()} == before


def test_delete_rows_removes_only_matching(spark, sf_dir, tmp_path):
    from openstack_billing_from_db_spark.sources.maintenance import delete_rows
    from openstack_billing_from_db_spark.sources.tables import load_table

    p = str(tmp_path / "ev_del")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(p)
    before = spark.read.parquet(p)
    n = before.count()
    victims = before.filter("user_id % 7 = 0").count()
    assert victims > 0

    res = delete_rows(spark, p, "user_id % 7 = 0")
    assert res["rows_before"] == n
    assert res["rows_deleted"] == victims
    assert res["rows_after"] == n - victims

    after = spark.read.parquet(p)
    assert after.count() == n - victims
    assert after.filter("user_id % 7 = 0").count() == 0


def test_delete_rows_null_predicate_rows_survive(spark, tmp_path):
    from pyspark.sql import functions as F

    from openstack_billing_from_db_spark.sources.maintenance import delete_rows

    p = str(tmp_path / "nulls_del")
    spark.createDataFrame(
        [(1, 10), (2, None), (3, 99)], "id long, v long"
    ).write.mode("overwrite").parquet(p)
    res = delete_rows(spark, p, "v > 50")  # NULL for id=2 -> kept
    assert res["rows_deleted"] == 1
    kept = {r.id for r in spark.read.parquet(p).collect()}
    assert kept == {1, 2}


def test_delete_rows_noop_without_matches(spark, tmp_path):
    import os

    from openstack_billing_from_db_spark.sources.maintenance import delete_rows

    p = str(tmp_path / "noop_del")
    spark.createDataFrame([(1,), (2,)], "id long").write.mode(
        "overwrite"
    ).parquet(p)
    files = sorted(os.listdir(p))
    res = delete_rows(spark, p, "id > 100")
    assert res["rows_deleted"] == 0 and res["rows_after"] == 2
    assert sorted(os.listdir(p)) == files  # untouched, no rewrite


def test_fast_worker_daemon_zipimport_gate(tmp_path, monkeypatch):
    """The stat gate re-parses a zip's central directory only when the
    archive changed; a genuine change still invalidates (the addPyFile
    contract)."""
    import zipfile
    import zipimport

    from openstack_billing_from_db_spark import fast_worker_daemon as fwd

    fwd.apply_zipimport_stat_gate()  # idempotent

    zp = tmp_path / "mod.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("m1.py", "X = 1\n")
    zi = zipimport.zipimporter(str(zp))

    calls = {"n": 0}
    orig_read = zipimport._read_directory

    def counting_read(archive):
        calls["n"] += 1
        return orig_read(archive)

    monkeypatch.setattr(zipimport, "_read_directory", counting_read)
    zi.invalidate_caches()
    first = calls["n"]
    assert first >= 1  # unknown stat -> must re-read
    zi.invalidate_caches()
    zi.invalidate_caches()
    assert calls["n"] == first  # unchanged archive -> gated, no re-read

    # a real change re-reads and the new content is visible
    import time as _time

    _time.sleep(0.01)  # ensure mtime_ns moves even on coarse clocks
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("m1.py", "X = 2\n")
        z.writestr("m2.py", "Y = 3\n")
    zi.invalidate_caches()
    assert calls["n"] > first
    assert zi.find_spec("m2") is not None


def test_fast_worker_daemon_session_conf(spark):
    """The shared session carries the fast-daemon conf and the python
    boundary works end to end under it."""
    import os

    import pandas as pd

    assert (
        spark.conf.get("spark.python.daemon.module")
        == "openstack_billing_from_db_spark.fast_worker_daemon"
    )
    # the daemon resolves the package via PYTHONPATH (set by get_spark)
    assert any(
        os.path.isdir(os.path.join(p, "openstack_billing_from_db_spark"))
        for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if p
    )

    def double(it):
        for pdf in it:
            pdf["id"] = pdf["id"] * 2
            yield pdf

    got = (
        spark.range(0, 10, 1, 3)
        .mapInPandas(double, "id long")
        .toPandas()["id"]
        .sort_values()
        .tolist()
    )
    assert got == [i * 2 for i in range(10)]


def test_local_mode_gc_thread_cap(spark):
    """Local masters cap G1's GC parallelism to a quarter of the task
    slots (floor 4/2): in local mode task threads, driver threads and GC
    threads share one machine, and the JDK default (~5/8 of cores)
    oversubscribes it (r13 attribution: per-query median 0.874 capped vs
    stock at local[32] sf0.1). The cap must scale with the master's slot
    count and honor the SPARK_GRAFT_STOCK_GC escape hatch."""
    import re

    opts = spark.conf.get("spark.driver.extraJavaOptions", "")
    m = re.search(r"-XX:ParallelGCThreads=(\d+) -XX:ConcGCThreads=(\d+)", opts)
    assert m, opts
    n_slots = int(spark.sparkContext.master.split("[", 1)[1].rstrip("]"))
    assert int(m.group(1)) == max(4, n_slots // 4)
    assert int(m.group(2)) == max(2, max(4, n_slots // 4) // 4)
