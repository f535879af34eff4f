"""Declarative data-quality checks (generalizing the reference's single
``assert runtime <= window`` at billing.py:146 into an operator).

Each check is a named predicate; ``violations`` returns one row per rule
with its violation count (0 = pass), evaluated in a single pass per
source table. ``enforce`` raises when any rule fails — the job-killing
behavior the reference's assert had, but with a per-rule report and
without collecting data to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null_{col}", F.col(col).isNull()


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    return f"range_{col}", (F.col(col) < lo) | (F.col(col) > hi)


def matches(col: str, pattern: str) -> tuple[str, Column]:
    return f"matches_{col}", ~F.col(col).rlike(pattern)


def violations(df: DataFrame, *rules: tuple[str, Column]) -> DataFrame:
    """One aggregation pass: per rule, the count of violating rows."""
    aggs = [
        F.sum(F.when(predicate, 1).otherwise(0)).cast("long").alias(name)
        for name, predicate in rules
    ]
    wide = df.agg(*aggs)
    return wide.unpivot([], [name for name, _ in rules], "rule", "n_violations")


def unique_violations(df: DataFrame, cols: list[str], rule: str) -> DataFrame:
    return (
        df.groupBy(*cols)
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit(rule).alias("rule"), F.coalesce(F.col("n"), F.lit(0)).alias("n_violations"))
    )


def referential_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, rule: str
) -> DataFrame:
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        F.lit(rule).alias("rule"), F.col("n").alias("n_violations")
    )


def enforce(report: DataFrame) -> None:
    bad = report.filter(F.col("n_violations") > 0).collect()
    if bad:
        raise ValueError(
            "data-quality violations: "
            + ", ".join(f"{r.rule}={r.n_violations}" for r in bad)
        )


def observed(
    df: DataFrame, name: str, *rules: tuple[str, Column]
) -> "tuple[DataFrame, object]":
    """Attach zero-cost pipeline observability: each rule's VIOLATION
    count rides the next action as a ``df.observe`` CollectMetrics node
    (computed inside the same job — no second scan, unlike running the
    ``violations`` report separately). Returns (df, Observation); read
    ``observation.get`` after any action on the returned frame.

    This is the production monitoring half of the quality story: the
    reference's one inline assert (P5, billing.py:84-90) generalizes to
    batch reports (``violations``/``enforce``) for gating and to
    observed metrics for per-run dashboards — at 100 TB a separate
    quality scan doubles the read; an observation is free."""
    from pyspark.sql import Observation

    obs = Observation(name)
    exprs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(rule)
        for rule, cond in rules  # cond is the VIOLATION predicate
    ]
    exprs.append(F.count(F.lit(1)).cast("long").alias("__rows"))
    return df.observe(obs, *exprs), obs
