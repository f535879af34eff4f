"""Z-order clustered writes (sources/zorder.py): per-file parquet
min/max footers must bound EVERY clustered dimension, where a plain
single-column sort bounds only its own column — the property row-group
pruning actually uses."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.sources.zorder import (
    file_column_ranges,
    write_zordered,
    zorder_value,
)


def _avg_norm_range(ranges, col, lo, hi):
    span = max(hi - lo, 1)
    vals = [(r[col][1] - r[col][0]) / span for r in ranges if col in r]
    assert vals, f"no footer stats for {col}"
    return sum(vals) / len(vals)


def test_zorder_value_interleaves_round_robin(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    (row,) = df.select(
        zorder_value([F.col("x"), F.col("y")], bits=3).alias("z")
    ).collect()
    # x bits -> lanes 0,2,4 ; y bits -> lanes 1,3,5
    expected = (1 << 0) | (0 << 2) | (1 << 4) | (1 << 1) | (1 << 3) | (0 << 5)
    assert row.z == expected


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    # two independent uniform dims: a linear sort on x leaves y's
    # per-file range ~full-width; z-order bounds both
    n = 20_000
    df = (
        spark.range(n)
        .select(
            ((F.col("id") * 2654435761) % 8192).alias("x"),
            ((F.col("id") * 1103515245 + 12345) % 8192).alias("y"),
        )
    )
    zpath = str(tmp_path / "zordered")
    spath = str(tmp_path / "xsorted")
    write_zordered(df, zpath, ["x", "y"], num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )
    zr = file_column_ranges(zpath, ["x", "y"])
    sr = file_column_ranges(spath, ["x", "y"])
    # sanity: same data round-trips
    assert spark.read.parquet(zpath).count() == n

    zx = _avg_norm_range(zr, "x", 0, 8191)
    zy = _avg_norm_range(zr, "y", 0, 8191)
    sx = _avg_norm_range(sr, "x", 0, 8191)
    sy = _avg_norm_range(sr, "y", 0, 8191)
    # linear sort: x tightly bounded, y unbounded
    assert sx < 0.15 and sy > 0.9
    # z-order: BOTH bounded well below full width
    assert zx < 0.6 and zy < 0.6, (zx, zy)

    # the payoff: a selective filter on the SECOND dimension prunes
    # files under z-order but touches every file under the x-sort
    # (aligned quarter-height slab so curve pieces don't straddle it)
    def files_touching_y(ranges, lo, hi):
        return sum(1 for r in ranges if not (r["y"][1] < lo or r["y"][0] > hi))

    assert files_touching_y(sr, 2048, 4095) == len(sr)  # no pruning
    assert files_touching_y(zr, 2048, 4095) <= len(zr) // 2  # real pruning


def test_zorder_timestamp_column(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    path = str(tmp_path / "ev_z")
    write_zordered(ev, path, ["user_id", "ts"], num_files=8)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert set(back.columns) == set(ev.columns)
    ranges = file_column_ranges(path, ["user_id"])
    assert len(ranges) >= 2  # actually split into multiple files


def test_zorder_rejects_overflowing_lanes(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    with pytest.raises(ValueError):
        write_zordered(df, "/tmp/never", ["a", "b", "c"], bits=32)
    with pytest.raises(ValueError):
        write_zordered(df, "/tmp/never", [])
