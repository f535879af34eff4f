"""Schema evolution on directory-backed tables (signature indexes,
epoch states, compacted corpora): a long-lived parquet directory
accumulates files written under different schema versions; reads must
unify them instead of failing or silently dropping the new columns."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write(path, cols):
    pq.write_table(pa.table(cols), path)


def test_merge_schema_unifies_added_column(spark, tmp_path):
    d = str(tmp_path / "idx")
    import os

    os.makedirs(d)
    # v1 files: (doc_id, sig); a later writer adds a quality column
    _write(f"{d}/v1.parquet", {"doc_id": pa.array([1, 2], pa.int64()),
                               "sig": pa.array(["a", "b"])})
    _write(f"{d}/v2.parquet", {"doc_id": pa.array([3], pa.int64()),
                               "sig": pa.array(["c"]),
                               "quality": pa.array([7], pa.int64())})
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert sorted(df.columns) == ["doc_id", "quality", "sig"]
    rows = {r.doc_id: (r.sig, r.quality) for r in df.collect()}
    # old files surface the new column as NULL, not an error
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 7)}
    # filters on the evolved column still reach the scan
    plan = (
        df.filter(F.col("quality") > 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(quality), GreaterThan(quality,5)]" in plan, plan


def test_default_read_keeps_first_schema(spark, tmp_path):
    # without mergeSchema Spark samples one footer — the new column may
    # silently vanish; this pins the hazard the option exists to fix
    d = str(tmp_path / "idx2")
    import os

    os.makedirs(d)
    _write(f"{d}/a.parquet", {"doc_id": pa.array([1], pa.int64())})
    _write(f"{d}/b.parquet", {"doc_id": pa.array([2], pa.int64()),
                              "extra": pa.array([9], pa.int64())})
    cols = set(spark.read.parquet(d).columns)
    merged = set(spark.read.option("mergeSchema", "true").parquet(d).columns)
    assert merged == {"doc_id", "extra"}
    assert cols.issubset(merged)
