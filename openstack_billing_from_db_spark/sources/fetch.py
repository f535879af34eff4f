"""S3 dump discovery + download — twin of the reference's daily-cron
entry point (reference fetch.py:11-95): find today's Nova mysqldump
across the three controller prefixes, download it, gunzip it.

The boto3 client is injectable so the listing/fallthrough logic is fully
unit-testable without S3 (tests/test_nova_ingest.py uses a fake client).
Decompression uses Python's gzip (the reference shells out to ``gzip -d``,
fetch.py:85-92 — same result, no subprocess).

This is deliberately driver-side: it fetches ONE file per day. The
distributed path for bulk history is ``spark.read`` over ``s3a://``
parquet (sources/tables.py); this module only covers the reference's
operational "grab today's dump" workflow.
"""

from __future__ import annotations

import gzip
import os
import shutil
from datetime import datetime

# reference fetch.py:65 — dumps may land on any of the three controllers
CONTROLLER_PREFIXES = ("nerc-ctl-0", "nerc-ctl-1", "nerc-ctl-2")


def find_latest_dump_key(
    s3_client, bucket: str, today: str | None = None
) -> str:
    """First dump object for ``today`` (YYYYMMDD), checking controller
    prefixes in order and taking the first listing with contents
    (reference fetch.py:62-73)."""
    today = today or datetime.today().strftime("%Y%m%d")
    for ctl in CONTROLLER_PREFIXES:
        dumps = s3_client.list_objects_v2(
            Bucket=bucket, Prefix=f"dbs/{ctl}/nova-{today}"
        )
        contents = dumps.get("Contents")
        if contents:
            return contents[0]["Key"]
    raise FileNotFoundError(f"No database dumps found for {today}")


def maybe_gunzip(path: str) -> str:
    """Decompress ``*.gz`` in place (reference fetch.py:85-93); returns
    the uncompressed path (unchanged if not gzipped)."""
    root, ext = os.path.splitext(path)
    if ext != ".gz":
        return path
    with gzip.open(path, "rb") as src, open(root, "wb") as dst:
        shutil.copyfileobj(src, dst)
    os.remove(path)
    return root


def download_latest_dump_from_s3(
    s3_client=None,
    *,
    today: str | None = None,
    download_dir: str = "/tmp",
) -> str:
    """Download + gunzip today's Nova dump; returns the local .sql path
    (reference fetch.py:11-95). Without an injected client, builds one
    from the same environment variables the reference reads
    (S3_INPUT_ENDPOINT_URL / S3_INPUT_BUCKET / S3_INPUT_ACCESS_KEY_ID /
    S3_INPUT_SECRET_ACCESS_KEY, fetch.py:42-53)."""
    if s3_client is None:
        try:
            import boto3
        except ImportError as exc:  # pragma: no cover - boto3 absent here
            raise NotImplementedError("S3 dump download requires boto3") from exc
        key_id = os.getenv("S3_INPUT_ACCESS_KEY_ID")
        secret = os.getenv("S3_INPUT_SECRET_ACCESS_KEY")
        if not key_id or not secret:
            raise ValueError(
                "Must provide S3_INPUT_ACCESS_KEY_ID and"
                " S3_INPUT_SECRET_ACCESS_KEY environment variables."
            )
        s3_client = boto3.client(
            "s3",
            endpoint_url=os.getenv(
                "S3_INPUT_ENDPOINT_URL", "https://holecs.rc.fas.harvard.edu"
            ),
            aws_access_key_id=key_id,
            aws_secret_access_key=secret,
        )
    bucket = os.getenv("S3_INPUT_BUCKET", "nerc-osp-backups")
    key = find_latest_dump_key(s3_client, bucket, today)
    dest = os.path.join(download_dir, os.path.basename(key))
    s3_client.download_file(bucket, key, dest)
    return maybe_gunzip(dest)
