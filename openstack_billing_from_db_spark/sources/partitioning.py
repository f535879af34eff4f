"""Date-partitioned event storage — the ingest-side layout that makes
billing-window queries prune at the scan.

At 100 TB the event table must be laid out so a one-month billing window
reads one month of files: hive-partition by event date (coarse pruning)
and optionally bucket by instance within partitions (shuffle-free
sessionization, see sources/bucketing.py). tests/test_partitioning.py
verifies the PartitionFilters actually appear in the scan.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_partitioned(
    events: DataFrame, out_dir: str, ts_col: str = "ts"
) -> None:
    """Write events hive-partitioned by event date."""
    (
        events.withColumn("event_date", F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(out_dir)
    )


def read_events_window(
    spark: SparkSession,
    events_dir: str,
    window_start: datetime,
    window_end: datetime,
    ts_col: str = "ts",
) -> DataFrame:
    """Scan only the partitions overlapping the billing window. The
    event_date predicate prunes directories; the ts predicate pushes into
    the row groups of the surviving files."""
    return spark.read.parquet(events_dir).filter(
        (F.col("event_date") >= F.lit(window_start.date()))
        & (F.col("event_date") < F.lit(window_end.date()))
        & (F.col(ts_col) >= F.lit(window_start))
        & (F.col(ts_col) < F.lit(window_end))
    )
