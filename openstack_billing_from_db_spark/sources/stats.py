"""One-pass column statistics for file-backed tables — the ANALYZE
TABLE equivalent for a parquet-directory engine (null counts, approx
NDV, min/max per column), produced by a single aggregation job.

These are the numbers a planner spends: NDV drives join-side broadcast
decisions and bucket counts; min/max bounds partition pruning; null
fractions pick outer-join strategies. The reference
(CCI-MOC/openstack-billing-from-db) has no statistics machinery;
beyond-reference component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_stats(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """One row per column: ``(column, n_rows, n_nulls, approx_ndv,
    min_repr, max_repr)``. Single full scan, single aggregation —
    every statistic partial-aggregates, so the shuffle is one row per
    partition regardless of table size. min/max are stringified so one
    schema covers heterogeneous column types (complex types have no
    ordering; their min/max are NULL)."""
    exprs = [F.count(F.lit(1)).alias("__n_rows")]
    orderable = {}
    for name, dtype in df.dtypes:
        c = F.col(f"`{name}`")
        exprs.append(F.count(F.when(c.isNull(), 1)).alias(f"__nulls_{name}"))
        exprs.append(F.approx_count_distinct(c, rsd).alias(f"__ndv_{name}"))
        plain = not (
            dtype.startswith(("array", "map", "struct")) or dtype == "binary"
        )
        orderable[name] = plain
        if plain:
            exprs.append(F.min(c).cast("string").alias(f"__min_{name}"))
            exprs.append(F.max(c).cast("string").alias(f"__max_{name}"))
    row = df.agg(*exprs)
    null_s = F.lit(None).cast("string")
    entries = [
        F.struct(
            F.lit(name).alias("column"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"__nulls_{name}").alias("n_nulls"),
            F.col(f"__ndv_{name}").alias("approx_ndv"),
            (F.col(f"__min_{name}") if orderable[name] else null_s).alias(
                "min_repr"
            ),
            (F.col(f"__max_{name}") if orderable[name] else null_s).alias(
                "max_repr"
            ),
        )
        for name, _ in df.dtypes
    ]
    return row.select(F.explode(F.array(*entries)).alias("s")).select("s.*")
