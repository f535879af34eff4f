"""Generate a scaled replica of the sf0.1 testdata (default 10× ≈ sf1)
for the scaling-curve bench (scripts/scaling_bench.py).

Replication shifts every entity key per replica so CARDINALITIES scale
(10× events → 10× instances; 10× documents → 10× docs), not just row
counts — the dimension a partition/bucket strategy actually cares about.
Text gets a per-replica token (so replicas are near- not exact-dups) and
embeddings a small deterministic per-replica perturbation (so LSH buckets
spread instead of stacking the identical vector 10×).

Usage: python scripts/make_scale_data.py [factor] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from openstack_billing_from_db_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

KEY_PAD = 100_000_000


def _replicate(df: DataFrame, factor: int, shift_exprs) -> DataFrame:
    parts = [df if i == 0 else df.select(*shift_exprs(i)) for i in range(factor)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main(factor: int = 10, out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        f"x{factor}",
    )
    spark = get_spark(app_name="make-scale-data")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    _replicate(
        ev,
        factor,
        lambda i: [
            (F.col("event_id") + i * KEY_PAD).alias("event_id"),
            F.col("ts"),
            (F.col("user_id") + i * KEY_PAD).alias("user_id"),
            F.col("event_type"),
            F.col("value"),
            F.col("props"),
        ],
    ).repartition(32).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    doc_cols = docs.columns

    def doc_shift(i):
        return [
            (F.col(c) + i * KEY_PAD).alias(c)
            if c == "doc_id"
            else F.concat(F.col(c), F.lit(f" replica{i}tok")).alias(c)
            if c == "text"
            else F.col(c)
            for c in doc_cols
        ]

    _replicate(docs, factor, doc_shift).repartition(32).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    emb_cols = emb.columns

    def emb_shift(i):
        # deterministic additive perturbation: keeps vectors near their
        # original (realistic near-dup clusters) while flipping enough
        # near-zero hyperplane dots to spread LSH buckets
        return [
            (F.col(c) + i * KEY_PAD).alias(c)
            if c == "vec_id"
            else F.transform(
                F.col(c),
                lambda x, idx: (
                    x + F.sin((F.col("vec_id") % 997 + idx) * F.lit(float(i)) * 1.7) * 0.05
                ).cast("float"),
            ).alias(c)
            if c == "embedding"
            else F.col(c)
            for c in emb_cols
        ]

    _replicate(emb, factor, emb_shift).repartition(32).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/embeddings.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    _replicate(
        li,
        factor,
        lambda i: [
            (F.col(c) + i * KEY_PAD).alias(c) if c == "l_orderkey" else F.col(c)
            for c in li.columns
        ],
    ).repartition(32).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    _replicate(
        orders,
        factor,
        lambda i: [
            (F.col(c) + i * KEY_PAD).alias(c) if c == "o_orderkey" else F.col(c)
            for c in orders.columns
        ],
    ).repartition(32).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")

    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    print(out_dir)
    return out_dir


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else None
    main(factor, out)
