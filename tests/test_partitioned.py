"""sources/partitioned.py: Hive-layout writes must actually prune
(PartitionFilters at PLANNING time — only the matching directory's
files are read) and dynamic overwrite must replace exactly the
partitions present in the incoming batch."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from openstack_billing_from_db_spark.sources.partitioned import (
    overwrite_partitions,
    write_partitioned,
)


def _events_with_date(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("event_date", F.to_date("ts"))
    )


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ev_part")
    ev = _events_with_date(spark, sf_dir)
    write_partitioned(ev, out, ["event_date"])
    # Hive layout on disk
    dirs = [d for d in os.listdir(out) if d.startswith("event_date=")]
    assert len(dirs) > 5

    back = spark.read.parquet(out)
    one_day = sorted(dirs)[3].split("=", 1)[1]
    filtered = back.filter(F.col("event_date") == one_day)

    # 1) the filter becomes a PartitionFilter (planning-time pruning) …
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan, plan
    # 2) … and only that directory's files are actually read
    touched = {
        r.f
        for r in filtered.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert touched, "expected at least one file"
    assert all(f"event_date={one_day}/" in f for f in touched), touched
    # correctness: partition column round-trips
    assert (
        filtered.count()
        == ev.filter(F.col("event_date") == one_day).count()
    )


def test_dynamic_overwrite_replaces_only_incoming_partitions(
    spark, sf_dir, tmp_path
):
    out = str(tmp_path / "ev_dyn")
    ev = _events_with_date(spark, sf_dir)
    write_partitioned(ev, out, ["event_date"])
    days = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(out)
        if d.startswith("event_date=")
    )
    target, untouched = days[0], days[1]
    before_untouched = (
        spark.read.parquet(out)
        .filter(F.col("event_date") == untouched)
        .count()
    )

    # rerun of one day with a halved batch
    rerun = ev.filter(F.col("event_date") == target).filter(
        F.col("event_id") % 2 == 0
    )
    new_rows = rerun.count()
    assert 0 < new_rows
    overwrite_partitions(rerun, out, ["event_date"])

    back = spark.read.parquet(out)
    assert back.filter(F.col("event_date") == target).count() == new_rows
    assert (
        back.filter(F.col("event_date") == untouched).count()
        == before_untouched
    )
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        != "dynamic"
    )


def test_files_per_partition_fans_out(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ev_fpp")
    ev = _events_with_date(spark, sf_dir)
    write_partitioned(ev, out, ["event_date"], files_per_partition=4)
    # at least one busy day actually splits into >1 file, and no day
    # exceeds the cap
    per_dir = []
    for d in os.listdir(out):
        if not d.startswith("event_date="):
            continue
        files = [
            f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")
        ]
        per_dir.append(len(files))
    assert per_dir and max(per_dir) > 1
    assert max(per_dir) <= 4
    # content unchanged
    assert spark.read.parquet(out).count() == ev.count()


def test_partition_cols_required(spark, sf_dir, tmp_path):
    import pytest

    ev = _events_with_date(spark, sf_dir)
    with pytest.raises(ValueError):
        write_partitioned(ev, str(tmp_path / "x"), [])
    with pytest.raises(ValueError):
        overwrite_partitions(ev, str(tmp_path / "y"), [])
    with pytest.raises(ValueError):
        write_partitioned(
            ev, str(tmp_path / "z"), ["event_date"], files_per_partition=0
        )
