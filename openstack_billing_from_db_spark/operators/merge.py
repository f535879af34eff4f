"""MERGE / slowly-changing-dimension emulation without a transactional
table format.

Delta/Iceberg jars are not in this container, so MERGE INTO is composed
from primitive ops (the standard emulation):

- ``merge_upsert``: next snapshot = updates ∪ (target anti-join updates).
  At scale both sides hash-partition on the key once; writing the result
  as the new snapshot (or per-epoch partition, see streaming/incremental)
  gives atomic swap semantics.
- ``scd2_apply``: type-2 history maintenance — closing changed rows at
  the effective date and appending the new versions, keyed rows compared
  on a change hash.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: list[str]) -> DataFrame:
    """Upsert: rows from ``updates`` win; unmatched target rows survive."""
    return updates.unionByName(target.join(updates, key, "left_anti"))


def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    *,
    key: list[str],
    compare_cols: list[str],
    effective: datetime,
) -> DataFrame:
    """Apply a new full snapshot to an SCD2 history table.

    ``history`` columns: key + compare_cols + valid_from + valid_to
    (valid_to null = current row). Changed keys have their current row
    closed at ``effective`` and a new open row appended; new keys open a
    row; unchanged/closed rows pass through untouched.
    """
    change_hash = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in compare_cols]))
    current = history.filter(F.col("valid_to").isNull()).withColumn("__h", change_hash)
    closed = history.filter(F.col("valid_to").isNotNull())
    snap = snapshot.withColumn("__h", change_hash)

    joined = current.alias("c").join(
        snap.alias("s"), [F.col(f"c.{k}") == F.col(f"s.{k}") for k in key], "full_outer"
    )
    same = F.col("c.__h") == F.col("s.__h")

    # current rows that survive unchanged
    unchanged = joined.filter(same).select("c.*").drop("__h")
    # current rows whose key changed or disappeared → close at effective
    to_close = (
        joined.filter(F.col("s.__h").isNull() | (~same))
        .filter(F.col("c.__h").isNotNull())
        .select("c.*")
        .drop("__h")
        .withColumn("valid_to", F.lit(effective))
    )
    # snapshot rows that are new or changed → open at effective
    to_open = (
        joined.filter(F.col("c.__h").isNull() | (~same))
        .filter(F.col("s.__h").isNotNull())
        .select("s.*")
        .drop("__h")
        .withColumn("valid_from", F.lit(effective))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
    )
    return closed.unionByName(unchanged).unionByName(to_close).unionByName(to_open)
