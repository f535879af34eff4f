"""Service-unit derivation (reference model.py:28-46, 197-283).

The reference parses the ``pci_requests`` JSON string per row with
``json.loads`` (model.py:247-254) and derives the flavor's SU type/count
imperatively. Here both are native Column expressions — ``from_json`` plus
CASE arithmetic — so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.schemas import PCI_REQUESTS

# reference model.py:203-204 — note "a2" is priced (billing.py:195) but
# rejected by the parser; reproduced as-is (SURVEY.md §2.11 #2).
ACCEPTED_GPU_ALIASES = ("a100", "a100-sxm4", "v100", "k80")


def parse_pci_requests(pci_col: Column | str) -> Column:
    """JSON string → array<struct<count,alias_name>>; malformed input
    parses to null, matching the reference's TypeError→warn+None path
    (model.py:247-254)."""
    col = F.col(pci_col) if isinstance(pci_col, str) else pci_col
    return F.from_json(col, PCI_REQUESTS)


def service_unit_columns(pci_col: Column | str, vcpus: Column | str, memory_mb: Column | str):
    """Returns (su_type, gpu_count, service_units, quarantine) columns.

    - su_type: ``gpu_{alias with '-' removed}`` (model.py:207) or ``cpu``.
    - gpu_count: ``int(pci[0]['count'])`` (model.py:206), 0 for CPU.
    - service_units: ``gpu_count or int(max(vcpus, memory/4096))``
      (model.py:41-46 — "1 CPU SU = 0 GPU, 1 CPU, 4 GB RAM").
    - quarantine: non-null error string where the reference raises —
      multiple pci entries (model.py:199-202) or an unaccepted alias
      (model.py:203-204). At scale a bad row must not kill the job;
      callers fail or divert on ``quarantine IS NOT NULL``.
    """
    pci = parse_pci_requests(pci_col)
    vc = F.col(vcpus) if isinstance(vcpus, str) else vcpus
    mem = F.col(memory_mb) if isinstance(memory_mb, str) else memory_mb

    alias_lower = F.lower(pci[0]["alias_name"])
    has_gpu = pci.isNotNull() & (F.size(pci) >= 1)
    quarantine = (
        F.when(pci.isNotNull() & (F.size(pci) > 1), F.lit("multiple pci_requests entries"))
        .when(
            has_gpu & ~alias_lower.isin(*ACCEPTED_GPU_ALIASES),
            F.concat(F.lit("unsupported gpu alias: "), alias_lower),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    su_type = F.when(
        has_gpu & quarantine.isNull(),
        F.concat(F.lit("gpu_"), F.regexp_replace(alias_lower, "-", "")),
    ).otherwise(F.lit("cpu"))
    gpu_count = F.when(
        has_gpu & quarantine.isNull(), pci[0]["count"].cast("int")
    ).otherwise(F.lit(0))
    service_units = service_units_expr(gpu_count, vc, mem)
    return su_type, gpu_count, service_units, quarantine


def service_units_expr(gpu_count: Column, vcpus: Column, memory_mb: Column) -> Column:
    """``gpu_count or int(max(vcpus, memory/4096))`` (model.py:41-46).
    Python ``int()`` truncates toward zero; values are non-negative so
    floor matches."""
    cpu_su = F.floor(F.greatest(vcpus.cast("double"), memory_mb.cast("double") / F.lit(4096.0))).cast("int")
    return F.when(gpu_count > 0, gpu_count).otherwise(cpu_su)
