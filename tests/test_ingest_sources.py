"""Ingest-path parity (VERDICT.md missing items 1-3): S3 dump discovery
with an injectable client (ref fetch.py:11-95), the nerc-rates HTTP rate
card with an injectable fetcher (ref main.py:174-192), and the
mysqldump→parquet converter (ref fetch.py:98-124) feeding the real
billing plan."""

from __future__ import annotations

import gzip
import os
from datetime import datetime
from decimal import Decimal

import pytest

from openstack_billing_from_db_spark.sources.fetch import (
    download_latest_dump_from_s3,
    find_latest_dump_key,
)
from openstack_billing_from_db_spark.sources.mysqldump import (
    mysqldump_to_parquet,
    nova_tables_from_dump,
)
from openstack_billing_from_db_spark.sources.rates import (
    fetch_rate_card,
    rates_from_url,
)


# --- S3 dump discovery ------------------------------------------------------


class FakeS3:
    """list_objects_v2/download_file double mirroring the boto3 client
    surface the reference uses (fetch.py:56-83)."""

    def __init__(self, objects: dict[str, bytes]):
        self.objects = objects
        self.listed_prefixes: list[str] = []

    def list_objects_v2(self, Bucket, Prefix):
        self.listed_prefixes.append(Prefix)
        keys = sorted(k for k in self.objects if k.startswith(Prefix))
        return {"Contents": [{"Key": k} for k in keys]} if keys else {}

    def download_file(self, bucket, key, dest):
        with open(dest, "wb") as f:
            f.write(self.objects[key])


def test_dump_discovery_falls_through_controllers(tmp_path):
    dump_sql = b"-- MySQL dump\n"
    s3 = FakeS3(
        {"dbs/nerc-ctl-1/nova-20240202000002.sql.gz": gzip.compress(dump_sql)}
    )
    path = download_latest_dump_from_s3(
        s3, today="20240202", download_dir=str(tmp_path)
    )
    # ctl-0 was tried first, ctl-1 matched (reference fetch.py:65-70)
    assert s3.listed_prefixes == [
        "dbs/nerc-ctl-0/nova-20240202",
        "dbs/nerc-ctl-1/nova-20240202",
    ]
    # downloaded and gunzipped in place, .gz removed
    assert path.endswith("nova-20240202000002.sql")
    assert open(path, "rb").read() == dump_sql
    assert not os.path.exists(path + ".gz")


def test_dump_discovery_no_dumps_raises():
    with pytest.raises(FileNotFoundError, match="20240303"):
        find_latest_dump_key(FakeS3({}), "nerc-osp-backups", "20240303")


# --- nerc-rates rate card ---------------------------------------------------


RATES_YAML = """
rates:
  - name: CPU SU Rate
    history:
      - value: "0.013"
        from: 2023-06
  - name: GPUA100SXM4 SU Rate
    history:
      - value: "2.078"
        from: 2023-06
  - name: GPUA100 SU Rate
    history:
      - value: "1.500"
        from: 2023-06
        until: 2023-12
      - value: "1.803"
        from: 2024-01
  - name: GPUV100 SU Rate
    history: [{value: "1.214", from: 2023-06}]
  - name: GPUK80 SU Rate
    history: [{value: "0.463", from: 2023-06}]
  - name: GPUA2 SU Rate
    history: [{value: "0.463", from: 2023-06}]
  - name: Charge for Stopped Instances
    history: [{value: "True", from: 2023-06}]
"""


def test_fetch_rate_card_month_ranges():
    fetched_urls = []

    def fake_fetcher(url):
        fetched_urls.append(url)
        return RATES_YAML

    card, include_stopped = fetch_rate_card("2024-01", fetcher=fake_fetcher)
    assert include_stopped is True
    by_type = {t: r for t, _, r in card}
    # 2024-01 falls in the SECOND a100 history entry
    assert by_type["gpu_a100"] == Decimal("1.803")
    assert by_type["cpu"] == Decimal("0.013")

    old_card, _ = fetch_rate_card("2023-07", fetcher=fake_fetcher)
    assert {t: r for t, _, r in old_card}["gpu_a100"] == Decimal("1.500")
    assert fetched_urls and fetched_urls[0].startswith("https://")


def test_rates_from_url_dataframe(spark):
    df = rates_from_url(spark, "https://example/rates.yaml", "2024-01",
                        fetcher=lambda u: RATES_YAML)
    rows = {r.service_unit_type: r for r in df.collect()}
    assert len(rows) == 6 and float(rows["gpu_a100"].rate) == 1.803


def test_rate_missing_month_raises():
    with pytest.raises(KeyError, match="CPU SU Rate"):
        fetch_rate_card("2023-01", fetcher=lambda u: RATES_YAML)


# --- mysqldump → parquet ----------------------------------------------------


NOVA_DUMP = r"""-- MySQL dump 10.13  Distrib 8.0
DROP TABLE IF EXISTS `instances`;
CREATE TABLE `instances` (
  `created_at` datetime DEFAULT NULL,
  `deleted_at` datetime DEFAULT NULL,
  `uuid` varchar(36) NOT NULL,
  `hostname` varchar(255) DEFAULT NULL,
  `project_id` varchar(255) DEFAULT NULL,
  `instance_type_id` int DEFAULT NULL,
  `vcpus` int DEFAULT NULL,
  `memory_mb` int DEFAULT NULL,
  `deleted` int DEFAULT NULL,
  PRIMARY KEY (`uuid`),
  KEY `instances_project_id_idx` (`project_id`)
) ENGINE=InnoDB DEFAULT CHARSET=utf8mb3;
INSERT INTO `instances` VALUES ('2000-01-01 00:00:00',NULL,'cpu1','box\'s host','projA',1,2,8192,0),('2000-01-01 00:00:00','2000-01-02 00:00:00','gpu1','gpu, box','projA',2,4,16384,1);
INSERT INTO `instances` VALUES ('2000-01-01 00:00:00',NULL,'cpu2','plain','projB',1,8,4096,0);
DROP TABLE IF EXISTS `instance_extra`;
CREATE TABLE `instance_extra` (
  `instance_uuid` varchar(36) NOT NULL,
  `pci_requests` text
) ENGINE=InnoDB;
INSERT INTO `instance_extra` VALUES ('cpu1',NULL),('gpu1','[{"count": "2", "alias_name": "a100"}]'),('cpu2','[]');
DROP TABLE IF EXISTS `instance_actions`;
CREATE TABLE `instance_actions` (
  `created_at` datetime DEFAULT NULL,
  `instance_uuid` varchar(36) DEFAULT NULL,
  `action` varchar(255) DEFAULT NULL,
  `message` varchar(255) DEFAULT NULL
) ENGINE=InnoDB;
INSERT INTO `instance_actions` VALUES ('2000-01-01 00:00:00','cpu1','create',''),('2000-01-01 10:00:00','cpu1','delete',''),('2000-01-01 00:00:00','gpu1','create',''),('2000-01-01 00:00:00','cpu2','create',NULL);
DROP TABLE IF EXISTS `unrelated`;
CREATE TABLE `unrelated` (
  `x` int DEFAULT NULL
) ENGINE=InnoDB;
INSERT INTO `unrelated` VALUES (1),(2);
"""


def _write_dump(tmp_path, gzipped=False) -> str:
    if gzipped:
        p = str(tmp_path / "nova.sql.gz")
        with gzip.open(p, "wt") as f:
            f.write(NOVA_DUMP)
    else:
        p = str(tmp_path / "nova.sql")
        with open(p, "w") as f:
            f.write(NOVA_DUMP)
    return p


def test_mysqldump_to_parquet_values(spark, tmp_path):
    paths = mysqldump_to_parquet(
        _write_dump(tmp_path), str(tmp_path / "pq"),
        tables=("instances", "instance_extra", "instance_actions"),
    )
    assert set(paths) == {"instances", "instance_extra", "instance_actions"}
    inst = {r.uuid: r for r in spark.read.parquet(paths["instances"]).collect()}
    assert len(inst) == 3
    # MySQL escapes round-trip: \' and an embedded comma
    assert inst["cpu1"].hostname == "box's host"
    assert inst["gpu1"].hostname == "gpu, box"
    assert inst["cpu1"].deleted_at is None and inst["gpu1"].deleted == 1
    assert inst["cpu2"].vcpus == 8
    acts = spark.read.parquet(paths["instance_actions"]).collect()
    assert len(acts) == 4 and any(r.message is None for r in acts)


def test_dump_golden_matches_direct_load(spark, tmp_path):
    """nova_instance_dim over converted dump output == the same data
    loaded directly as DataFrames (VERDICT.md item 6's done-criterion)."""
    from openstack_billing_from_db_spark.plans.billing import nova_instance_dim
    from openstack_billing_from_db_spark.schemas import INSTANCE_EXTRA, INSTANCES

    instances, extra, actions = nova_tables_from_dump(
        spark, _write_dump(tmp_path, gzipped=True), str(tmp_path / "pq")
    )
    dim_dump = nova_instance_dim(instances, extra, datetime(2000, 1, 1))

    direct_inst = spark.createDataFrame(
        [
            ("cpu1", "box's host", "projA", 1, 2, 8192, 0, None),
            ("gpu1", "gpu, box", "projA", 2, 4, 16384, 1, datetime(2000, 1, 2)),
            ("cpu2", "plain", "projB", 1, 8, 4096, 0, None),
        ],
        INSTANCES,
    )
    direct_extra = spark.createDataFrame(
        [
            ("cpu1", None),
            ("gpu1", '[{"count": "2", "alias_name": "a100"}]'),
            ("cpu2", "[]"),
        ],
        INSTANCE_EXTRA,
    )
    dim_direct = nova_instance_dim(direct_inst, direct_extra, datetime(2000, 1, 1))

    key = lambda r: r["uuid"]
    got = sorted(([r.asDict() for r in dim_dump.collect()]), key=key)
    want = sorted(([r.asDict() for r in dim_direct.collect()]), key=key)
    assert got == want and len(got) == 3


def test_cli_invoices_from_dump(tmp_path, spark):
    """The reference's actual daily workflow: dump file in, CSV out."""
    from openstack_billing_from_db_spark.cli import main

    out = str(tmp_path / "inv.csv")
    main(
        [
            "--sql-dump-file", _write_dump(tmp_path),
            "--convert-sql-dump-file-to-sqlite",
            "--start", "2000-01-01",
            "--end", "2000-02-01",
            "--output", out,
        ]
    )
    lines = open(out).read().splitlines()
    body = [ln for ln in lines[1:] if ln]
    # cpu1 10h×2SU @0.013 → 0.26; gpu1 24h×2SU @1.803 → 86.54
    assert any(",20,OpenStack CPU,0.013,0.26," in ln for ln in body), body
    assert any(",48,OpenStack GPUA100,1.803,86.54," in ln for ln in body), body


# --- tokenizer fuzz: render random rows as MySQL INSERT syntax, parse back ---

from hypothesis import given, settings, strategies as st

from openstack_billing_from_db_spark.sources.mysqldump import iter_value_tuples


def _render_sql_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (int, float)):
        return repr(v)
    out = v.replace("\\", "\\\\").replace("'", "\\'")
    out = out.replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r")
    return f"'{out}'"


_cell = st.one_of(
    st.none(),
    st.integers(-(2**62), 2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=1),
        max_size=24,
    ),
)


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(st.lists(_cell, min_size=1, max_size=6), min_size=1, max_size=5))
def test_iter_value_tuples_round_trip(rows):
    width = len(rows[0])
    rows = [r[:width] + [None] * (width - len(r)) for r in rows]
    text = ",".join("(" + ",".join(_render_sql_value(v) for v in r) + ")" for r in rows)
    got = list(iter_value_tuples(text + ";"))
    assert got == rows
