"""Nova-shaped ingest parity (reference model.py:224-293): liveness
filter, instance_extra left join, pci JSON parsing with the reference's
quirk set (FIXTURES.md §3 B2/B3), and the full nova_invoice pipeline over
hand-built Nova tables."""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.plans.billing import nova_instance_dim, nova_invoice
from openstack_billing_from_db_spark.schemas import INSTANCE_ACTIONS, INSTANCE_EXTRA, INSTANCES
from openstack_billing_from_db_spark.sources.rates import rates_df

START, END = datetime(2000, 1, 1), datetime(2000, 2, 1)


def _instances(spark, rows):
    return spark.createDataFrame(rows, INSTANCES)


def _extra(spark, rows):
    return spark.createDataFrame(rows, INSTANCE_EXTRA)


def test_pci_parsing_golden(spark):
    """B3: a100 count '2' → (gpu_a100, 2); a100-sxm4 ×4 → (gpu_a100sxm4, 4)."""
    instances = _instances(
        spark,
        [
            ("i1", "h1", "p1", 1, 1, 4096, 0, None),
            ("i2", "h2", "p1", 1, 1, 4096, 0, None),
            ("i3", "h3", "p1", 1, 2, 8192, 0, None),
        ],
    )
    extra = _extra(
        spark,
        [
            ("i1", '[{"count": "2", "alias_name": "a100"}]'),
            ("i2", '[{"count": 4, "alias_name": "A100-SXM4"}]'),
        ],
    )
    dim = {r.uuid: r for r in nova_instance_dim(instances, extra, START).collect()}
    assert (dim["i1"].su_type, dim["i1"].gpu_count, dim["i1"].service_units) == ("gpu_a100", 2, 2)
    assert (dim["i2"].su_type, dim["i2"].gpu_count, dim["i2"].service_units) == ("gpu_a100sxm4", 4, 4)
    # CPU path: service_units = max(vcpus, memory/4096) (model.py:41-46)
    assert (dim["i3"].su_type, dim["i3"].service_units) == ("cpu", 2)
    assert all(r.quarantine is None for r in dim.values())


def test_pci_quirks_quarantined(spark):
    """§2.11 #2: 'a2' is priced but rejected by the parser; multi-entry pci
    raises. The engine quarantines instead of crashing (documented)."""
    instances = _instances(
        spark,
        [
            ("a2box", "h", "p1", 1, 1, 4096, 0, None),
            ("multi", "h", "p1", 1, 1, 4096, 0, None),
            ("junk", "h", "p1", 1, 1, 4096, 0, None),
        ],
    )
    extra = _extra(
        spark,
        [
            ("a2box", '[{"count": "1", "alias_name": "A2"}]'),
            ("multi", '[{"count": "1", "alias_name": "V100"}, {"count": "1", "alias_name": "K80"}]'),
            ("junk", "not valid json"),  # TypeError→null path (model.py:247-254)
        ],
    )
    dim = {r.uuid: r for r in nova_instance_dim(instances, extra, START).collect()}
    assert dim["a2box"].quarantine == "unsupported gpu alias: a2"
    assert dim["multi"].quarantine == "multiple pci_requests entries"
    # malformed JSON parses to null → CPU instance, no quarantine
    assert dim["junk"].quarantine is None and dim["junk"].su_type == "cpu"

    with pytest.raises(ValueError, match="quarantined instance"):
        nova_instance_dim(instances, extra, START, fail_on_quarantine=True)


def test_liveness_filter(spark):
    """P2 (model.py:240-244): deleted before window start AND deleted=1 → excluded."""
    instances = _instances(
        spark,
        [
            ("gone", "h", "p1", 1, 1, 4096, 1, datetime(1999, 12, 1)),
            ("deleted_in_window", "h", "p1", 1, 1, 4096, 1, datetime(2000, 1, 10)),
            ("alive", "h", "p1", 1, 1, 4096, 0, None),
        ],
    )
    dim = nova_instance_dim(instances, None, START)
    assert {r.uuid for r in dim.collect()} == {"deleted_in_window", "alive"}


def test_nova_invoice_end_to_end(spark):
    """Full pipeline on Nova-shaped fixtures: B1-style runtime + B2-style
    SU-hour accumulation across CPU and GPU instances of one project."""
    instances = _instances(
        spark,
        [
            # 2 vcpus/8GB → 2 SU, runs 10h
            ("cpu1", "h", "projA", 1, 2, 8192, 0, None),
            # a100 ×2 → 2 SU, runs 24h then deleted via deleted_at
            ("gpu1", "h", "projA", 2, 4, 16384, 1, datetime(2000, 1, 2)),
        ],
    )
    extra = _extra(spark, [("gpu1", '[{"count": "2", "alias_name": "a100"}]')])
    actions = spark.createDataFrame(
        [
            ("cpu1", datetime(2000, 1, 1, 0), "create", ""),
            ("cpu1", datetime(2000, 1, 1, 10), "delete", ""),
            ("gpu1", datetime(2000, 1, 1, 0), "create", ""),
        ],
        INSTANCE_ACTIONS,
    )
    dim = nova_instance_dim(instances, extra, START)
    inv = nova_invoice(actions, dim, rates_df(spark), START, END)
    rows = {(r.project_id, r.su_type): r for r in inv.collect()}
    # cpu1: ceil(10h)=10 × 2 SU = 20 SU-hours @ 0.013 → 0.26
    assert rows[("projA", "cpu")].su_hours == 20
    assert rows[("projA", "cpu")].cost == pytest.approx(0.26)
    # gpu1: ceil(24h)=24 × 2 SU = 48 SU-hours @ 1.803 → 86.54 (HALF_UP)
    assert rows[("projA", "gpu_a100")].su_hours == 48
    # 1.803 × 48 = 86.544 → 86.54 (HALF_UP to cents, billing.py:202)
    assert rows[("projA", "gpu_a100")].cost == float(
        (Decimal("1.803") * 48).quantize(Decimal("0.01"))
    )


def test_invalid_su_type_rejected_at_rates_join(spark):
    """B2: an SU type with no rate row produces no invoice row (the
    reference raises on unknown accumulator attributes; the engine's inner
    rates join drops it — surfaced by comparing joined vs input types)."""
    instances = _instances(spark, [("x", "h", "p", 1, 1, 4096, 0, None)])
    actions = spark.createDataFrame(
        [("x", datetime(2000, 1, 1), "create", "")], INSTANCE_ACTIONS
    )
    dim = nova_instance_dim(instances, None, START).withColumn(
        "su_type", F.lit("gpu_fake")
    )
    inv = nova_invoice(actions, dim, rates_df(spark), START, END)
    assert inv.collect() == []
