"""Parquet (and optionally JDBC/S3) table sources.

Replaces the reference's storage engine — an in-memory SQLite load of a
mysqldump (reference model.py:181-188, fetch.py:11-124). Spark reads
columnar parquet (or JDBC for a live Nova DB) directly:

- S3 download + gunzip (reference fetch.py:83-93) disappear — Spark
  reads ``s3a://`` URIs and compressed formats natively.
- mysqldump→sqlite dialect conversion (reference fetch.py:98-124)
  disappears — no dialect shim is needed for parquet/JDBC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.schemas import TESTDATA_TABLES


# parquet TIMESTAMP(NANOS) columns read as long nanos (see session.py);
# canonicalized to TimestampType by flooring to micros — identical to
# DuckDB's ns→us truncation, so oracle comparisons stay exact.
NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def canonical_timestamps(df: DataFrame, nano_cols: tuple[str, ...] = ()) -> DataFrame:
    """Canonicalize every timestamp flavor the testdata has shipped in to
    plain TimestampType UTC instants:

    - TIMESTAMP(NANOS) read as long nanos (``nano_cols``) → floor to micros
      (identical to DuckDB's ns→us truncation);
    - naive TIMESTAMP(MICROS), which Spark 4 reads as TIMESTAMP_NTZ → cast
      to TIMESTAMP (wall-clock-preserving under the UTC session timezone
      forced in ``load_table``, matching DuckDB's naive-as-UTC semantics);
    - already-instant TIMESTAMP → unchanged.

    Downstream interval math (``unix_micros``) requires TimestampType, so
    this keeps every plan format-independent across data regenerations.
    """
    dtypes = dict(df.dtypes)
    exprs = []
    changed = False
    for name in df.columns:
        if name in nano_cols and dtypes[name] == "bigint":
            exprs.append(F.timestamp_micros(F.expr(f"`{name}` div 1000")).alias(name))
            changed = True
        elif dtypes[name] == "timestamp_ntz":
            exprs.append(F.col(name).cast("timestamp").alias(name))
            changed = True
        else:
            exprs.append(F.col(name))
    return df.select(*exprs) if changed else df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Parquet gives predicate pushdown + column pruning."""
    # oracle parity requires UTC timestamp semantics even when the caller
    # (e.g. the driver harness) built the session with another timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # small single-file tables otherwise scan as ONE partition, serializing
    # every map-side stage (shingling/hashing run 1-core while 31 idle).
    # minPartitionNum splits files at planning time — parallelism without
    # adding an exchange, and a no-op at scale where file count ≫ cores.
    spark.conf.set(
        "spark.sql.files.minPartitionNum", str(spark.sparkContext.defaultParallelism)
    )
    if name in NANO_TS_COLUMNS:
        # runtime-settable; required for TIMESTAMP(NANOS) parquet even when
        # the caller (e.g. the driver harness) built the session without it
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return canonical_timestamps(df, NANO_TS_COLUMNS.get(name, ()))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def nova_jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
):
    """JDBC source for a live Nova MySQL DB (replaces the dump pipeline).

    ``partition_column`` bounds split the scan into parallel range reads —
    essential at scale; a single-connection JDBC read is a driver bottleneck.
    Gated: requires the MySQL JDBC jar on the classpath.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1 << 31))
        )
    return reader.load()
