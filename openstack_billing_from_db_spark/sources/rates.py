"""Rates dimension (reference billing.py:19-35, main.py:174-202).

The reference models rates as six Decimal attributes on a dataclass and
"joins" them via dynamic attribute lookup (billing.py:198-201). Here the
rate card is a 6-row long-format dimension DataFrame, broadcast-joined on
``service_unit_type`` — the type is a value, not six columns.

Example production rates from reference tools/pod.yaml:24-29.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from openstack_billing_from_db_spark.schemas import RATES

# (service_unit_type, display name, $/SU-hr) — display names from
# reference billing.py:30-35; example rates from tools/pod.yaml:24-29.
DEFAULT_RATE_CARD: list[tuple[str, str, str]] = [
    ("cpu", "OpenStack CPU", "0.013"),
    ("gpu_a100sxm4", "OpenStack GPUA100SXM4", "2.078"),
    ("gpu_a100", "OpenStack GPUA100", "1.803"),
    ("gpu_v100", "OpenStack GPUV100", "1.214"),
    ("gpu_k80", "OpenStack GPUK80", "0.463"),
    ("gpu_a2", "OpenStack GPUA2", "0.463"),
]


def default_rates() -> list[tuple[str, str, Decimal]]:
    return [(t, n, Decimal(r)) for t, n, r in DEFAULT_RATE_CARD]


def rates_df(spark: SparkSession, card: list[tuple[str, str, Decimal]] | None = None) -> DataFrame:
    return spark.createDataFrame(card or default_rates(), schema=RATES)


def rates_from_url(spark: SparkSession, url: str, invoice_month: str) -> DataFrame:
    """Driver-side HTTP fetch of a rate card (reference main.py:176-192
    pulls from the nerc-rates repo). Network fetch stays on the driver;
    the result is a tiny broadcastable dimension.
    """
    raise NotImplementedError(
        "HTTP rate-card fetch is environment-specific; construct the card "
        "driver-side and pass it to rates_df()."
    )
