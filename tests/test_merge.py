"""MERGE upsert and SCD2 history maintenance (the no-Delta emulation)."""

from __future__ import annotations

from datetime import datetime

from openstack_billing_from_db_spark.operators.merge import merge_upsert, scd2_apply

D1 = datetime(2024, 1, 1)
D2 = datetime(2024, 2, 1)


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [("a", 1), ("b", 2)], "k string, v int"
    )
    updates = spark.createDataFrame(
        [("b", 20), ("c", 30)], "k string, v int"
    )
    out = {(r.k, r.v) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert out == {("a", 1), ("b", 20), ("c", 30)}


def test_scd2_rate_change(spark):
    history = spark.createDataFrame(
        [
            ("cpu", "0.013", D1, None),
            ("gpu_v100", "1.214", D1, None),
        ],
        "service_unit_type string, rate string, valid_from timestamp, valid_to timestamp",
    )
    snapshot = spark.createDataFrame(
        [
            ("cpu", "0.015"),       # changed
            ("gpu_v100", "1.214"),  # unchanged
            ("gpu_a2", "0.463"),    # new
        ],
        "service_unit_type string, rate string",
    )
    out = scd2_apply(
        history,
        snapshot,
        key=["service_unit_type"],
        compare_cols=["rate"],
        effective=D2,
    )
    rows = {(r.service_unit_type, r.rate, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        ("cpu", "0.013", D1, D2),          # closed old version
        ("cpu", "0.015", D2, None),        # new open version
        ("gpu_v100", "1.214", D1, None),   # unchanged, still open
        ("gpu_a2", "0.463", D2, None),     # new key opened
    }


def test_scd2_key_removed_closes_row(spark):
    history = spark.createDataFrame(
        [("cpu", "0.013", D1, None)],
        "service_unit_type string, rate string, valid_from timestamp, valid_to timestamp",
    )
    snapshot = spark.createDataFrame([], "service_unit_type string, rate string")
    out = scd2_apply(
        history, snapshot, key=["service_unit_type"], compare_cols=["rate"], effective=D2
    )
    rows = {(r.service_unit_type, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {("cpu", D1, D2)}
