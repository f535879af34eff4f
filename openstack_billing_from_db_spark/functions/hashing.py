"""Cross-engine-portable 64-bit hashing.

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` use different
algorithms, so every hash that must agree with the DuckDB oracle is
derived from md5 (identical everywhere): the first 15 hex chars of the
digest parsed as a base-16 integer → a deterministic unsigned 60-bit
value that fits a signed BIGINT in both engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column) -> Column:
    """60-bit integer hash of a string column; equals the DuckDB
    expression produced by :func:`portable_hash64_sql`."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def seeded_hash64(col: Column, seed: str) -> Column:
    """Independent hash family member: prefix the input with a seed."""
    return portable_hash64(F.concat(F.lit(f"{seed}|"), col))


def seeded_hash64_sql(expr: str, seed: str) -> str:
    return portable_hash64_sql(f"concat('{seed}|', {expr})")


def spark_portable_hash64_sql(expr: str) -> str:
    """Spark-SQL source form of :func:`portable_hash64` (Spark's conv,
    not the DuckDB concat-0x form) — for operators that assemble their
    expression trees as single-parse SQL strings."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def spark_seeded_hash64_sql(expr: str, seed: str) -> str:
    """Spark-SQL source form of :func:`seeded_hash64`."""
    return spark_portable_hash64_sql(f"concat('{seed}|', {expr})")


def py_hash64(s: str) -> int:
    """Driver-side twin of :func:`portable_hash64` for deterministic,
    data-independent constants (e.g. LSH hyperplane signs)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
