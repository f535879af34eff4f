"""Z-order clustered parquet writes: multi-dimensional data-skipping.

A table sorted on one column gives parquet row-group min/max pruning on
that column only; filters on a second column scan everything. Writing in
Morton (Z-curve) order bounds every output file's range in EVERY
clustered dimension, so min/max stats prune scans for filters on any of
them — the ``OPTIMIZE ZORDER BY`` capability, built from plain DataFrame
ops (the reference CCI-MOC/openstack-billing-from-db has no table
maintenance at all; beyond-reference component).

Scale shape: one tiny min/max aggregation (broadcast back as literals),
a map-side fixed-point normalize + bit-interleave (whole-stage codegen,
no Python), then ``repartitionByRange`` on the z-value — a single
range-exchange, the same cost class as any global sort-write. No
driver-side data movement beyond the 2k-row min/max collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(colname: str, cmin: int, cmax: int, bits: int) -> Column:
    """Fixed-point map of [cmin, cmax] onto [0, 2^bits): exact integer
    arithmetic, monotone, constant-per-write."""
    span = max(cmax - cmin, 1)
    top = (1 << bits) - 1
    # divide-then-clamp (never multiply): immune to overflow however
    # wide the native span (e.g. decades of epoch-microseconds)
    step = span // (top + 1) + 1
    return F.expr(
        f"CAST(least(greatest({colname} - {cmin}L, 0L) div {step}L,"
        f" {top}L) AS BIGINT)"
    )


def zorder_value(norm_cols: list[Column], bits: int) -> Column:
    """Morton interleave of pre-normalized ``bits``-wide integer columns
    (round-robin bit placement, column 0 in the lowest lane). Pure
    integer Column expression — codegen-friendly, no UDF."""
    n = len(norm_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(norm_cols):
            z = z + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
            ).cast("long")
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    num_files: int = 8,
    bits: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``
    (integral or timestamp columns; timestamps interleave on their
    epoch-microsecond value). ``bits`` defaults to the widest lane
    budget that keeps the interleaved value inside a signed 64-bit long.
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits is None:
        bits = min(16, 62 // len(cols))
    if bits * len(cols) > 62:
        raise ValueError(f"{bits} bits x {len(cols)} cols overflows a long")

    def as_long(c: str) -> Column:
        dt = dict(df.dtypes)[c]
        if dt.startswith("timestamp"):
            # NTZ-safe: unix_micros needs the tz-aware flavor (the
            # driver's testdata has switched flavors before — see
            # sources/tables.canonical_timestamps)
            return F.unix_micros(F.col(c).cast("timestamp"))
        return F.col(c).cast("long")

    keyed = df.select("*", *[as_long(c).alias(f"__z_{c}") for c in cols])
    bounds = keyed.agg(
        *[F.min(f"__z_{c}").alias(f"mn_{c}") for c in cols],
        *[F.max(f"__z_{c}").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    norm = [
        _normalize(f"__z_{c}", bounds[f"mn_{c}"], bounds[f"mx_{c}"], bits)
        for c in cols
    ]
    (
        keyed.withColumn("__zval", zorder_value(norm, bits))
        .repartitionByRange(num_files, "__zval")
        .sortWithinPartitions("__zval")
        .drop("__zval", *[f"__z_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_ranges(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    """Per-file (min, max) of each column from parquet footer metadata —
    the statistics a scan planner prunes with. Test/inspection helper."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        entry: dict[str, tuple] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                cname = col.path_in_schema
                if cname not in cols or col.statistics is None:
                    continue
                st = col.statistics
                lo, hi = entry.get(cname, (st.min, st.max))
                entry[cname] = (min(lo, st.min), max(hi, st.max))
        if entry:
            out.append(entry)
    return out
