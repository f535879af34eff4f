"""As-of (point-in-time) join — an operator Spark lacks natively,
composed from existing DataFrame ops (no pandas, no per-key loops).

Formulation: union the two sides with a side tag, window over
(key, ts, right-first-at-ties), and carry the last-seen right row forward
with ``last(..., ignorenulls=True)``; left rows then hold their most
recent right match. One shuffle (the window partition by key), linear in
total rows — at 100 TB this beats the per-key ``pd.merge_asof`` pattern
because no group ever materializes in Python, and skewed keys degrade to
a sort, not an OOM.

DuckDB's native ASOF JOIN is the oracle (plans/analytics_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` for the same key (inclusive, matching DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts``).

    Returns all left columns plus ``right_value_cols`` (null when no right
    row precedes the left row and ``how='left'``; inner drops them).
    """
    lcols = left.columns
    # __present is a constant non-null marker: match detection must not
    # depend on a value column, which may be legitimately NULL in a
    # matched right row (how='inner' would otherwise drop that left row)
    r_struct = F.struct(
        F.lit(1).alias("__present"), *[F.col(c) for c in right_value_cols]
    )
    r_struct_type = (
        right.select(F.lit(1).alias("__present"), *right_value_cols).schema
    )
    tagged_left = left.select(
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    tagged_right = right.select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.lit(None).cast(_struct_type(left, lcols)).alias("__l"),
        r_struct.alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    # right rows sort before left rows at equal ts → ties match (>= semantics)
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts"), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__is_right") == 0)

    if how == "inner":
        carried = carried.filter(F.col("__match.__present").isNotNull())
    return carried.select(
        *[F.col("__l")[c].alias(c) for c in lcols],
        *[F.col("__match")[c].alias(f"asof_{c}") for c in right_value_cols],
    )


def _struct_type(df: DataFrame, cols: list[str]):
    return df.select(*cols).schema
