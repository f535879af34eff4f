"""CLI entry point (reference main.py:34-219 re-expressed).

``python -m openstack_billing_from_db_spark.cli --start ... --end ...``

Differences from the reference, by design:
- the source is parquet (or JDBC), not a mysqldump→SQLite load;
- rates come from CLI flags or the built-in example card (the
  reference's nerc-rates HTTP fetch is environment-specific);
- the computation is the Spark DAG in plans/billing.py.
"""

from __future__ import annotations

import argparse
from datetime import datetime, timedelta
from decimal import Decimal


def parse_time_argument(arg: str) -> datetime:
    """ISO-8601 parse (reference utils.py:4-5)."""
    return datetime.fromisoformat(arg)


def default_start_argument() -> datetime:
    """First day of the month containing (today − 1 day), midnight
    (reference main.py:21-26)."""
    d = (datetime.today() - timedelta(days=1)).replace(day=1)
    return d.replace(hour=0, minute=0, second=0, microsecond=0)


def default_end_argument() -> datetime:
    """Today at midnight (reference main.py:28-30)."""
    return datetime.today().replace(hour=0, minute=0, second=0, microsecond=0)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m openstack_billing_from_db_spark.cli",
        description="PySpark-native invoicing from an instance event log",
    )
    p.add_argument("--start", type=parse_time_argument, default=default_start_argument())
    p.add_argument("--end", type=parse_time_argument, default=default_end_argument())
    p.add_argument("--invoice-month", default=None, help="e.g. 2024-01")
    p.add_argument("--data-dir", default="/root/testdata/sf0.001")
    p.add_argument("--output", "--output-file", dest="output", default="invoices.csv")
    p.add_argument("--include-stopped-runtime", action="store_true", default=False)
    for su in ("cpu", "gpu-a100", "gpu-a100sxm4", "gpu-v100", "gpu-k80", "gpu-a2"):
        p.add_argument(f"--rate-{su}-su", type=Decimal, default=None)
    p.add_argument("--upload-to-s3", action="store_true", default=False)
    # BooleanOptionalAction adds --no-upload-to-primary-location; the
    # reference's own `type=bool` flag (main.py:136-139) can never be
    # turned off from the command line — fixed here, not reproduced
    p.add_argument(
        "--upload-to-primary-location",
        action=argparse.BooleanOptionalAction,
        default=True,
    )
    # accepted for flag parity with the reference (main.py:66-95); these
    # describe the mysqldump→SQLite ingest path the Spark engine replaces
    # with direct parquet/JDBC scans (SURVEY.md S1/S4), and the NERC
    # rate-card HTTP fetch (environment-specific; gated)
    p.add_argument("--sql-dump-file", default=None)
    p.add_argument("--convert-sql-dump-file-to-sqlite", action="store_true", default=False)
    p.add_argument("--download-sql-dump-from-s3", action="store_true", default=False)
    p.add_argument("--use-nerc-rates", action="store_true", default=False)
    return p


def main(argv: list[str] | None = None) -> str:
    from openstack_billing_from_db_spark.plans.billing import (
        TESTDATA_TRIGGERS,
        invoice_csv_rows,
        nova_invoice,
        testdata_billing_tables,
    )
    from openstack_billing_from_db_spark.session import get_spark
    from openstack_billing_from_db_spark.sinks.csv import write_single_csv
    from openstack_billing_from_db_spark.sources.rates import (
        DEFAULT_RATE_CARD,
        rates_df,
    )

    args = build_parser().parse_args(argv)
    invoice_month = args.invoice_month or args.start.strftime("%Y-%m")

    for flag, name in (
        (args.sql_dump_file, "--sql-dump-file"),
        (args.convert_sql_dump_file_to_sqlite, "--convert-sql-dump-file-to-sqlite"),
        (args.download_sql_dump_from_s3, "--download-sql-dump-from-s3"),
        (args.use_nerc_rates, "--use-nerc-rates"),
    ):
        if flag:
            raise NotImplementedError(
                f"{name}: the Spark engine reads parquet/JDBC directly and takes "
                "rates from flags; see SURVEY.md S1/S4/S5 for the mapping"
            )

    card = []
    for su_type, su_name, default_rate in DEFAULT_RATE_CARD:
        flag = f"rate_{su_type}_su".replace("-", "_")
        override = getattr(args, flag, None)
        card.append((su_type, su_name, Decimal(override) if override else Decimal(default_rate)))

    spark = get_spark(app_name="invoicing-cli")
    actions, dim = testdata_billing_tables(spark, args.data_dir)
    rates = rates_df(spark, card)
    invoice = nova_invoice(
        actions,
        dim,
        rates,
        args.start,
        args.end,
        include_stopped_runtime=args.include_stopped_runtime,
        trigger_states=TESTDATA_TRIGGERS,
        message_col=None,
    )
    from datetime import timezone

    generated_at = datetime.now(timezone.utc).isoformat(timespec="seconds")
    csv_rows = invoice_csv_rows(
        invoice,
        rates,
        invoice_month=invoice_month,
        window_start=args.start,
        window_end=args.end,
        generated_at=generated_at,
    )
    out = write_single_csv(csv_rows, args.output)
    if args.upload_to_s3:
        from openstack_billing_from_db_spark.sinks.csv import upload_invoice_to_s3

        upload_invoice_to_s3(
            out,
            invoice_month,
            args.end,
            upload_to_primary_location=args.upload_to_primary_location,
        )
    return out


if __name__ == "__main__":
    print(main())
