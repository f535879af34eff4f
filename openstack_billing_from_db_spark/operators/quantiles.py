"""Mergeable histogram quantile sketch — distributed approximate
percentiles with engine-exact integer arithmetic.

The sketch is a fixed-width binned histogram: ``bin = value div W`` for
an integer bin width ``W``. Per (group, bin) counts are mergeable by
addition (like the count-min table in operators/sketch.py), so the state
composes across partitions, files, and days; a quantile estimate is the
inclusive upper edge of the first bin whose cumulative count reaches
``ceil(p · n)``. Error is bounded by the bin width — a knob the caller
sizes to the value range, independent of data volume.

Engine portability: Spark's ``percentile_approx`` (GK sketch) is
JVM-internal and not reproducible in DuckDB; exact ``percentile_disc``
differs between engines on interpolation flavor. Here everything is
BIGINT floor arithmetic — the rank test ``cum · 10^6 >= p_micro · n``
is the integer form of ``cum >= ceil(p · n)`` (probabilities carried as
micro-units), identical in both engines.

Plan shape at 100 TB: one partial-aggregated groupBy onto
(group, bin) cells — the exchange carries at most groups × (range/W)
keys, the map-side combine absorbs the volume — then windows over the
bins-sized cell table. Nothing wide shuffles, nothing collects. The
exact-rank rideable (``*_exact`` columns) is a corpus-wide row_number
window — the verification luxury the sketch replaces at scale; callers
drop it via ``with_exact=False``.

Reference: no quantile machinery exists in the reference
(beyond-reference north-star component).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# default probabilities in micro-units (p50 / p90 / p99)
DEFAULT_P_MICRO: tuple[int, ...] = (500_000, 900_000, 990_000)


def _p_label(p_micro: int) -> str:
    """500000 -> 'p50', 990000 -> 'p99', 999500 -> 'p99_95'."""
    pct_centi = p_micro // 100  # hundredths of a percent
    whole, frac = divmod(pct_centi, 100)
    return f"p{whole}" if frac == 0 else f"p{whole}_{frac:02d}"


def _validate(bin_width: int, p_micro: Sequence[int]) -> None:
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    for p in p_micro:
        if not 0 < p < 1_000_000:
            raise ValueError(f"p_micro values must be in (0, 1e6), got {p}")
    labels = [_p_label(p) for p in p_micro]
    if len(set(labels)) != len(labels):
        # _p_label truncates to centi-percent: probabilities finer than
        # 0.01% apart would silently collapse to one output column
        raise ValueError(
            f"p_micro values produce duplicate column labels {labels}; "
            "keep probabilities >= 0.01% apart (or deduplicate them)"
        )


def _floor_bin(bin_width: int) -> str:
    """SQL for ``val`` binned by FLOOR division — pure integer ops (no
    double round-trip), matching DuckDB ``//`` for negative values too
    (Spark ``div`` truncates toward zero, which would shift every
    negative value's bin up by one)."""
    w = bin_width
    return f"(val - (((val % {w}) + {w}) % {w})) div {w}"


def histogram_cells(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    bin_width: int,
) -> DataFrame:
    """The mergeable histogram state for one slice of the data: per
    (group, bin) row counts. Slices compose by ADDITION (groupBy-sum of
    cnt) — the partial/merge law the streaming accumulator
    (streaming/sketch_stream.py) runs on; :func:`quantiles_from_cells`
    turns state into estimates. Output: (group, bin, cnt)."""
    _validate(bin_width, DEFAULT_P_MICRO)
    return (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("long").alias("val"),
        )
        .select("g", F.expr(_floor_bin(bin_width)).alias("bin"))
        .groupBy("g", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumnRenamed("g", group_col)
    )


def quantiles_from_cells(
    cells: DataFrame,
    *,
    group_col: str,
    bin_width: int,
    p_micro: Sequence[int] = DEFAULT_P_MICRO,
) -> DataFrame:
    """Histogram state → per-group quantile estimates
    (group, n_rows, <pXX>_est ...). Input may hold MULTIPLE cnt rows per
    (group, bin) — e.g. the union of per-epoch streaming partitions —
    they are summed first (merge-by-addition)."""
    _validate(bin_width, p_micro)
    merged = (
        cells.select(F.col(group_col).alias("g"), "bin", "cnt")
        .groupBy("g", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    wn = Window.partitionBy("g")
    wcum = Window.partitionBy("g").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    edges = merged.select(
        "g",
        F.sum("cnt").over(wn).alias("n"),
        F.sum("cnt").over(wcum).alias("cum"),
        F.expr(f"(bin + 1) * {bin_width}L - 1").alias("edge"),
    )
    est_aggs = [
        F.min(
            F.when(F.col("cum") * 1_000_000 >= F.lit(p) * F.col("n"), F.col("edge"))
        ).alias(f"{_p_label(p)}_est")
        for p in p_micro
    ]
    return (
        edges.groupBy("g")
        .agg(F.max("n").alias("n_rows"), *est_aggs)
        .withColumnRenamed("g", group_col)
    )


def histogram_quantiles(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    bin_width: int,
    p_micro: Sequence[int] = DEFAULT_P_MICRO,
    with_exact: bool = True,
) -> DataFrame:
    """Per-group approximate quantiles from a fixed-width histogram.

    ``value_col`` is an integer column (negatives allowed — binning is
    floor division on both engines); estimates are the inclusive upper
    bin edge ``(bin + 1) · W - 1`` (so ``est >= exact`` always, and
    ``est - exact < W``). Output:
    (group, n_rows, <pXX>_est ..., [<pXX>_exact ...]).
    """
    _validate(bin_width, p_micro)
    vals = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("long").alias("val")
    )
    out = quantiles_from_cells(
        histogram_cells(df, group_col=group_col, value_col=value_col, bin_width=bin_width),
        group_col=group_col,
        bin_width=bin_width,
        p_micro=p_micro,
    ).withColumnRenamed(group_col, "g")

    if with_exact:
        wrank = Window.partitionBy("g").orderBy("val")
        ranked = vals.select(
            "g",
            "val",
            F.row_number().over(wrank).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n"),
        )
        exact_aggs = [
            F.min(
                F.when(F.col("rn") * 1_000_000 >= F.lit(p) * F.col("n"), F.col("val"))
            ).alias(f"{_p_label(p)}_exact")
            for p in p_micro
        ]
        exact = ranked.groupBy("g").agg(*exact_aggs)
        out = out.join(exact, "g")

    return out.withColumnRenamed("g", group_col)


def histogram_quantiles_sql(
    *,
    from_cte: str,
    group_col: str,
    bin_width: int,
    p_micro: Sequence[int] = DEFAULT_P_MICRO,
    with_exact: bool = True,
) -> str:
    """DuckDB twin of :func:`histogram_quantiles`, reading a CTE named
    ``from_cte`` with columns (group_col, val) where val is BIGINT.
    Emitted as a full SELECT so callers splice it after their WITH
    chain."""
    est_cols = ",\n       ".join(
        f"min(CASE WHEN cum * 1000000 >= {p} * n THEN edge END)"
        f" AS {_p_label(p)}_est"
        for p in p_micro
    )
    est_sel = f"""
SELECT {group_col}, CAST(max(n) AS BIGINT) AS n_rows,
       {est_cols}
FROM (
  SELECT {group_col}, n,
         sum(cnt) OVER (PARTITION BY {group_col} ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS cum,
         (bin + 1) * {bin_width} - 1 AS edge
  FROM (
    SELECT {group_col}, bin, count(*) AS cnt,
           sum(count(*)) OVER (PARTITION BY {group_col}) AS n
    FROM (SELECT {group_col}, val // {bin_width} AS bin FROM {from_cte})
    GROUP BY {group_col}, bin
  )
)
GROUP BY {group_col}"""
    if not with_exact:
        return est_sel
    exact_cols = ",\n       ".join(
        f"min(CASE WHEN rn * 1000000 >= {p} * n THEN val END)"
        f" AS {_p_label(p)}_exact"
        for p in p_micro
    )
    exact_names = ", ".join(f"x.{_p_label(p)}_exact" for p in p_micro)
    return f"""
SELECT e.*, {exact_names}
FROM ({est_sel}) e JOIN (
  SELECT {group_col},
         {exact_cols}
  FROM (
    SELECT {group_col}, val,
           row_number() OVER (PARTITION BY {group_col} ORDER BY val) AS rn,
           count(*) OVER (PARTITION BY {group_col}) AS n
    FROM {from_cte}
  )
  GROUP BY {group_col}
) x USING ({group_col})"""
