"""Decimal money arithmetic (reference billing.py:5, 19-29, 202).

Rates are ``DecimalType(10,4)``; costs are computed in decimal and
rounded to cents with HALF_UP — Spark's ``round`` on DecimalType is
HALF_UP, matching the reference's ``Decimal.quantize(".01", ROUND_HALF_UP)``.
Money never transits a double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cost(rate: Column, su_hours: Column) -> Column:
    """rate ($/SU-hr, decimal) × su_hours (bigint) → decimal cost
    (reference billing.py:64-85 ``rate * hours``)."""
    return rate * su_hours


def round_money(col: Column, scale: int = 2) -> Column:
    """HALF_UP rounding to cents (reference billing.py:202)."""
    return F.round(col, scale)
