"""The driver has regenerated testdata in different parquet timestamp
flavors across rounds — TIMESTAMP(NANOS) (round 1/2) and naive
TIMESTAMP(MICROS)/NTZ (round 3) — which silently changes the Spark-side
dtype (bigint / timestamp_ntz / timestamp). These tests pin that
``sources.tables.load_table`` canonicalizes ALL flavors to identical
TimestampType instants, so every downstream ``unix_micros`` plan is
regeneration-proof.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.sources.tables import load_table

_WALL = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 3, 15, 12, 34, 56, 789012),
    datetime.datetime(2024, 12, 31, 23, 59, 59, 999999),
]
_EXPECT_US = [int(w.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6) for w in _WALL]


def _write(tmpdir: str, flavor: str) -> str:
    d = f"{tmpdir}/{flavor}"
    ids = pa.array([1, 2, 3], pa.int64())
    if flavor == "ntz_micros":
        ts = pa.array(_WALL, pa.timestamp("us"))
    elif flavor == "utc_micros":
        ts = pa.array(_WALL, pa.timestamp("us", tz="UTC"))
    elif flavor == "nanos":
        ts = pa.array(_WALL, pa.timestamp("ns"))
    t = pa.table({"ts": ts, "user_id": ids})
    import os

    os.makedirs(d, exist_ok=True)
    # version>=2.6 keeps TIMESTAMP(NANOS) instead of coercing to micros
    pq.write_table(t, f"{d}/events.parquet", version="2.6")
    return d


@pytest.mark.parametrize("flavor", ["ntz_micros", "utc_micros", "nanos"])
def test_all_flavors_load_as_identical_instants(spark, tmp_path, flavor):
    d = _write(str(tmp_path), flavor)
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", df.dtypes
    got = [
        r.us
        for r in df.select(F.unix_micros("ts").alias("us")).orderBy("us").collect()
    ]
    assert got == _EXPECT_US, (flavor, got, _EXPECT_US)


def test_streaming_source_matches_batch_flavor(spark, tmp_path):
    """stream_events derives its declared schema from the file itself, so
    the same canonicalization holds on the streaming path."""
    from openstack_billing_from_db_spark.streaming.sessions import (
        run_stream_to_memory,
        stream_events,
    )

    d = _write(str(tmp_path), "ntz_micros")
    stream = stream_events(spark, d)
    assert dict(stream.dtypes)["ts"] == "timestamp", stream.dtypes
    run_stream_to_memory(
        stream.select(F.unix_micros("ts").alias("us")), "flavor_probe"
    )
    got = sorted(r.us for r in spark.table("flavor_probe").collect())
    assert got == _EXPECT_US


def test_non_utc_session_timezone_is_forced_back(spark, sf_dir):
    """A caller (or the driver harness) may hand us a session configured
    with any timezone; interval math and oracle parity require UTC.
    load_table forces it — timestamp-heavy results must be identical to
    the DuckDB naive-as-UTC oracle regardless of the incoming setting."""
    import duckdb

    from openstack_billing_from_db_spark.registry import all_oracle_sql, all_queries

    qs, osql = all_queries(), all_oracle_sql()
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        sdf = qs["q04_state_intervals"](spark, sf_dir)
        got = sorted(tuple(r) for r in sdf.collect())
        con = duckdb.connect()
        con.execute(
            f"create view events as select * from read_parquet('{sf_dir}/events.parquet')"
        )
        want = sorted(
            tuple(r) for r in con.execute(osql["q04_state_intervals"]).fetchall()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
