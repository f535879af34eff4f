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


def _rename_aside_swap(norm: str, tmp: str, old_prefix: str) -> None:
    """Replace directory ``norm`` with ``tmp`` so a failure at any point
    leaves a complete copy of the data on disk: the original stays
    intact until the verified rewrite is ready, and once the original is
    set aside the rewrite is never deleted. os.rename within one parent
    is a same-filesystem atomic rename — no copy window."""
    parent = os.path.dirname(norm)
    old = tempfile.mkdtemp(prefix=old_prefix, dir=parent)
    os.rmdir(old)  # reserve a unique sibling name for the rename-aside
    os.rename(norm, old)
    try:
        os.rename(tmp, norm)
    except BaseException:
        os.rename(old, norm)  # restore the original; tmp left for inspection
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(old, ignore_errors=True)


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
    _rename_aside_swap(norm, tmp, "compact_old_")
    return {
        "files_before": len(before),
        "files_after": len(_data_files(path)),
        "bytes": total_bytes,
        "rows": rows,
    }


def delete_rows(spark: SparkSession, path: str, predicate: str) -> dict:
    """Row-level erasure for a parquet directory (the GDPR /
    right-to-be-forgotten job): rewrite the table WITHOUT rows matching
    ``predicate``, verify the arithmetic (kept = before - matched), and
    swap with the same rename-aside protocol as compaction — at no
    point is the only copy of the data at risk.

    Delete semantics follow SQL DELETE: a row is removed iff the
    predicate evaluates TRUE; rows where it is FALSE **or NULL** are
    kept. Output file count is re-derived from the surviving byte
    fraction so repeated deletes don't accumulate small files.

    Returns {rows_before, rows_deleted, rows_after, files_after}.
    No-op (no rewrite) when nothing matches.
    """
    from pyspark.sql import functions as F

    norm = path.rstrip("/")
    df = spark.read.parquet(norm)
    rows_before = df.count()
    matched = df.filter(predicate).count()
    if matched == 0:
        return {
            "rows_before": rows_before,
            "rows_deleted": 0,
            "rows_after": rows_before,
            "files_after": None,
        }
    kept = df.filter(~F.coalesce(F.expr(predicate), F.lit(False)))

    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(norm)
        for f in fs
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    kept_rows = rows_before - matched
    kept_bytes = total_bytes * kept_rows // max(rows_before, 1)
    n_out = max(1, -(-kept_bytes // (128 * 1024 * 1024)))

    parent = os.path.dirname(norm)
    tmp = tempfile.mkdtemp(prefix="delete_", dir=parent)
    try:
        kept.repartition(int(n_out)).write.mode("overwrite").parquet(tmp)
        if spark.read.parquet(tmp).count() != kept_rows:
            raise RuntimeError("delete row-count mismatch; original kept")
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    _rename_aside_swap(norm, tmp, "delete_old_")
    files_after = sum(
        1
        for dp, _, fs in os.walk(norm)
        for f in fs
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    return {
        "rows_before": rows_before,
        "rows_deleted": matched,
        "rows_after": kept_rows,
        "files_after": files_after,
    }
