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
