"""CSV invoice sink with reference dialect parity (S7/S8).

Reference (billing.py:159-224): one CSV file, 16 fixed header columns,
``delimiter=","``, ``quotechar="|"``, ``QUOTE_MINIMAL``; then up to three
S3 uploads with templated keys (billing.py:244-293).

Spark mapping: ``df.write.csv`` with matching options. The single-file
requirement is a *reference-parity* constraint — the writer coalesces to
one partition only when asked; at scale you write partitioned output and
let the invoice consumer read the directory (or a manifest).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame


def write_single_csv(
    df: DataFrame,
    output_path: str,
    *,
    quote: str = "|",
    header: bool = True,
) -> str:
    """Write a DataFrame as ONE csv file at ``output_path`` (local path),
    matching the reference's csv.writer dialect: ',' delimiter, '|' quote,
    minimal quoting. Returns the output path.

    Implementation: Spark writes a single-partition directory, then the
    part file is moved into place. For ``s3a://`` destinations write the
    directory directly instead (object stores have no rename)."""
    tmp = tempfile.mkdtemp(prefix="invoice_csv_")
    try:
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("header", str(header).lower())
            .option("quote", quote)
            .option("escape", quote)  # csv doubles the quote char; so does Spark with escape=quote
            .option("emptyValue", "")
            .csv(os.path.join(tmp, "out"))
        )
        part = glob.glob(os.path.join(tmp, "out", "part-*.csv"))[0]
        os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
        shutil.move(part, output_path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return output_path


def invoice_s3_keys(
    invoice_month: str,
    window_end: datetime,
    *,
    now: datetime | None = None,
) -> dict[str, str]:
    """The reference's three upload key templates (billing.py:266-292):
    primary, daily (end−1s inclusive date), archive (UTC timestamp)."""
    now = now or datetime.now(timezone.utc)
    invoice_date = (window_end - timedelta(seconds=1)).strftime("%Y-%m-%d")
    timestamp = now.strftime("%Y%m%dT%H%M%SZ")
    return {
        "primary": (
            f"Invoices/{invoice_month}/"
            f"Service Invoices/NERC OpenStack {invoice_month}.csv"
        ),
        "daily": (
            f"Invoices/{invoice_month}/"
            f"Service Invoices/NERC OpenStack {invoice_date}.csv"
        ),
        "archive": (
            f"Invoices/{invoice_month}/"
            f"Archive/NERC OpenStack {invoice_month} {timestamp}.csv"
        ),
    }


def upload_invoice_to_s3(
    local_path: str,
    invoice_month: str,
    window_end: datetime,
    *,
    bucket: str | None = None,
    endpoint_url: str | None = None,
    upload_to_primary_location: bool = True,
) -> list[str]:
    """boto3-gated upload of the invoice CSV to the three reference
    locations. Credentials/endpoint via the same env variables the
    reference reads (billing.py:245-259)."""
    try:
        import boto3
    except ImportError as exc:  # pragma: no cover - boto3 absent in container
        raise NotImplementedError("S3 upload requires boto3") from exc

    endpoint = endpoint_url or os.getenv("S3_OUTPUT_ENDPOINT_URL")
    bucket = bucket or os.getenv("S3_OUTPUT_BUCKET", "nerc-invoicing")
    key_id = os.getenv("S3_OUTPUT_ACCESS_KEY_ID")
    secret = os.getenv("S3_OUTPUT_SECRET_ACCESS_KEY")
    if not key_id or not secret:
        raise ValueError(
            "Must provide S3_OUTPUT_ACCESS_KEY_ID and "
            "S3_OUTPUT_SECRET_ACCESS_KEY environment variables."
        )
    s3 = boto3.client(
        "s3", endpoint_url=endpoint, aws_access_key_id=key_id, aws_secret_access_key=secret
    )
    keys = invoice_s3_keys(invoice_month, window_end)
    uploaded = []
    for name, key in keys.items():
        if name == "primary" and not upload_to_primary_location:
            continue
        s3.upload_file(local_path, Bucket=bucket, Key=key)
        uploaded.append(key)
    return uploaded
