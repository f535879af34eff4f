"""Table-maintenance operations a long-lived parquet lake needs.

Streaming sinks and incremental jobs (streaming/incremental.py writes
one directory per epoch) accumulate SMALL FILES; at 100 TB a scan's task
count — and the NameNode/listing pressure — is governed by file count,
not byte count, so periodic compaction is a standing maintenance job in
every lakehouse deployment (Delta/Iceberg expose it as OPTIMIZE /
rewrite_data_files; plain parquet directories need it by hand).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 128,
    min_files: int = 2,
) -> dict:
    """Rewrite a parquet directory into ≈``target_file_mb`` files.

    The output file count comes from the directory's actual byte size
    (ceil(bytes / target)), not a guess — a repartition(1) would bottle-
    neck one task at scale, a blind repartition(200) recreates the small-
    file problem. Rewrite lands in a temp dir first and replaces the
    original only after success (no torn table on failure). Row-count is
    re-verified before the swap.

    Returns {files_before, files_after, bytes, rows}. No-op (files_before
    returned unchanged) when the directory already has < ``min_files``
    data files.
    """

    def _data_files(p: str) -> list[str]:
        return [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]

    before = _data_files(path)
    total_bytes = sum(os.path.getsize(f) for f in before)
    if len(before) < min_files:
        return {
            "files_before": len(before),
            "files_after": len(before),
            "bytes": total_bytes,
            "rows": None,
        }

    n_out = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    rows = df.count()
    norm = path.rstrip("/")
    parent = os.path.dirname(norm)
    tmp = tempfile.mkdtemp(prefix="compact_", dir=parent)
    try:
        # round-robin repartition: size-balanced output files regardless
        # of the input's partitioning or skew
        df.repartition(int(n_out)).write.mode("overwrite").parquet(tmp)
        if spark.read.parquet(tmp).count() != rows:
            raise RuntimeError("compaction row-count mismatch; original kept")
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    # Swap via rename-aside so a failure at any point leaves a complete
    # copy of the data on disk: the original stays intact until the
    # verified rewrite is ready, and once the original is set aside the
    # rewrite is never deleted. os.rename within one directory is a
    # same-filesystem atomic rename — no copy window.
    old = tempfile.mkdtemp(prefix="compact_old_", dir=parent)
    os.rmdir(old)  # reserve a unique sibling name for the rename-aside
    os.rename(norm, old)
    try:
        os.rename(tmp, norm)
    except BaseException:
        os.rename(old, norm)  # restore the original; tmp left for inspection
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(old, ignore_errors=True)
    return {
        "files_before": len(before),
        "files_after": len(_data_files(path)),
        "bytes": total_bytes,
        "rows": rows,
    }
