"""Local replica of the driver's correctness gate: run every registered
query via Spark AND its DuckDB oracle SQL on the same parquet, then
compare row count, column names, and exact values (order-insensitive).

Run at sf0.001 by default (SPARK_GRAFT_TEST_SF_DIR to override).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from openstack_billing_from_db_spark.registry import all_oracle_sql, all_queries
from openstack_billing_from_db_spark.schemas import TESTDATA_TABLES

QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    return value


def _rowset(columns, rows):
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = [tuple(_canon(r[i]) for i in idx) for r in rows]
    # None-safe, type-stable total order
    key = lambda row: [(v is None, str(type(v)), str(v)) for v in row]  # noqa: E731
    return sorted(canon, key=key), [columns[i] for i in idx]


ORACLE_QUERIES = sorted(ORACLE)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    rel = duck.sql(ORACLE[name])
    duck_rows = rel.fetchall()
    duck_cols = list(rel.columns)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    s_rows, cols = _rowset(spark_cols, spark_rows)
    d_rows, _ = _rowset(duck_cols, duck_rows)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]} (cols={cols})"


def test_every_query_runs(spark, sf_dir):
    """Queries without an oracle still must run and return a schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()
