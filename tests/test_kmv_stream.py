"""Streaming incremental cardinality (streaming/sketch_stream.py): the
KMV sketch accumulated over micro-batches must equal the batch sketch
over the union of all data — the merge law made operational."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.operators.sketch import (
    kmv_distinct,
    kmv_finalize,
    kmv_merge,
    kmv_partial,
)
from openstack_billing_from_db_spark.streaming.sketch_stream import (
    read_kmv_estimate,
    run_streaming_kmv,
)

K = 8


def _write_events(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        path,
    )


def test_partial_merge_finalize_equals_batch(spark):
    rows = [("click", i % 40) for i in range(300)] + [
        ("view", i % 5) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    whole = {
        r.event_type: r
        for r in kmv_distinct(
            df, group_col="event_type", value_col="user_id", k=K
        ).collect()
    }
    p1 = kmv_partial(
        df.limit(100), group_col="event_type", value_col="user_id", k=K
    )
    rest = df.subtract(df.limit(100))
    p2 = kmv_partial(rest, group_col="event_type", value_col="user_id", k=K)
    via_merge = {
        r.event_type: r
        for r in kmv_finalize(
            kmv_merge(p1.unionByName(p2), group_col="event_type", k=K),
            group_col="event_type",
            k=K,
        ).collect()
    }
    for g in whole:
        assert via_merge[g].kth_hash == whole[g].kth_hash
        assert via_merge[g].est_distinct == whole[g].est_distinct
    # 'view' has 5 < K distinct users: state is exact
    assert via_merge["view"].est_distinct == 5


def test_streaming_kmv_equals_batch_over_all_files(spark, tmp_path):
    stream_dir = str(tmp_path / "events_stream")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    b1 = [("click", i) for i in range(60)] + [("view", 1), ("view", 2)]
    b2 = [("click", i) for i in range(30, 90)] + [("view", 2), ("view", 3)]
    b3 = [("click", i) for i in range(200, 220)]
    _write_events(f"{stream_dir}/b1.parquet", b1)
    _write_events(f"{stream_dir}/b2.parquet", b2)
    _write_events(f"{stream_dir}/b3.parquet", b3)

    run_streaming_kmv(
        spark,
        stream_dir,
        "event_type string, user_id long",
        state_dir,
        ckpt,
        group_col="event_type",
        value_col="user_id",
        k=K,
    )
    streamed = {
        r.event_type: r
        for r in read_kmv_estimate(
            spark, state_dir, group_col="event_type", k=K
        ).collect()
    }
    batch = {
        r.event_type: r
        for r in kmv_distinct(
            spark.createDataFrame(b1 + b2 + b3, "event_type string, user_id long"),
            group_col="event_type",
            value_col="user_id",
            k=K,
        ).collect()
    }
    assert set(streamed) == set(batch) == {"click", "view"}
    for g in batch:
        assert streamed[g].kth_hash == batch[g].kth_hash
        assert streamed[g].est_distinct == batch[g].est_distinct
    assert streamed["view"].est_distinct == 3  # exact under k
    # state is bounded: at most k rows per group per epoch
    state = spark.read.parquet(state_dir)
    per_epoch = state.groupBy("epoch", "event_type").count().collect()
    assert all(r["count"] <= K for r in per_epoch)

    # a second run with one new file continues from the checkpoint and
    # folds the new epoch in
    b4 = [("click", i) for i in range(500, 560)] + [("view", 99)]
    _write_events(f"{stream_dir}/b4.parquet", b4)
    run_streaming_kmv(
        spark,
        stream_dir,
        "event_type string, user_id long",
        state_dir,
        ckpt,
        group_col="event_type",
        value_col="user_id",
        k=K,
    )
    streamed2 = {
        r.event_type: r
        for r in read_kmv_estimate(
            spark, state_dir, group_col="event_type", k=K
        ).collect()
    }
    batch2 = {
        r.event_type: r
        for r in kmv_distinct(
            spark.createDataFrame(
                b1 + b2 + b3 + b4, "event_type string, user_id long"
            ),
            group_col="event_type",
            value_col="user_id",
            k=K,
        ).collect()
    }
    for g in batch2:
        assert streamed2[g].kth_hash == batch2[g].kth_hash
        assert streamed2[g].est_distinct == batch2[g].est_distinct
    assert streamed2["view"].est_distinct == 4


# --- count-min + histogram streaming accumulators (merge-by-addition) --------


def test_streaming_countmin_equals_batch(spark, tmp_path):
    from openstack_billing_from_db_spark.operators.sketch import (
        countmin_build,
        countmin_probe,
    )
    from openstack_billing_from_db_spark.streaming.sketch_stream import (
        read_countmin_sketch,
        run_streaming_countmin,
    )

    stream_dir = str(tmp_path / "s")
    state_dir = str(tmp_path / "state")
    b1 = [("hot", 0)] * 30 + [("a", 0), ("b", 0)]
    b2 = [("hot", 0)] * 20 + [("b", 0), ("c", 0)]
    _write_events(f"{stream_dir}/b1.parquet", b1)
    _write_events(f"{stream_dir}/b2.parquet", b2)
    run_streaming_countmin(
        spark,
        stream_dir,
        "event_type string, user_id long",
        state_dir,
        str(tmp_path / "ckpt"),
        value_col="event_type",
    )
    live = read_countmin_sketch(spark, state_dir)
    whole = countmin_build(
        spark.createDataFrame(b1 + b2, "event_type string, user_id long"),
        value_col="event_type",
    )
    assert sorted(map(tuple, live.collect())) == sorted(map(tuple, whole.collect()))
    probes = spark.createDataFrame([("hot",), ("c",)], "event_type string")
    est = {
        r.event_type: r.est_count
        for r in countmin_probe(live, probes, value_col="event_type").collect()
    }
    assert est["hot"] >= 50 and est["c"] >= 1  # never underestimates


def test_streaming_histogram_equals_batch(spark, tmp_path):
    from openstack_billing_from_db_spark.operators.quantiles import (
        histogram_quantiles,
    )
    from openstack_billing_from_db_spark.streaming.sketch_stream import (
        read_histogram_quantiles,
        run_streaming_histogram,
    )

    stream_dir = str(tmp_path / "s")
    state_dir = str(tmp_path / "state")
    b1 = [("g", i) for i in range(1, 51)]
    b2 = [("g", i) for i in range(51, 101)] + [("h", 5)]
    _write_events(f"{stream_dir}/b1.parquet", b1)
    _write_events(f"{stream_dir}/b2.parquet", b2)
    run_streaming_histogram(
        spark,
        stream_dir,
        "event_type string, user_id long",
        state_dir,
        str(tmp_path / "ckpt"),
        group_col="event_type",
        value_col="user_id",
        bin_width=10,
    )
    live = {
        r.event_type: r
        for r in read_histogram_quantiles(
            spark, state_dir, group_col="event_type", bin_width=10
        ).collect()
    }
    batch = {
        r.event_type: r
        for r in histogram_quantiles(
            spark.createDataFrame(b1 + b2, "event_type string, user_id long"),
            group_col="event_type",
            value_col="user_id",
            bin_width=10,
            with_exact=False,
        ).collect()
    }
    assert set(live) == set(batch) == {"g", "h"}
    for g in live:
        assert tuple(live[g]) == tuple(batch[g])
    # the 1..100 stream: p50 falls in bin 5 (50-59), edge 59
    assert live["g"].p50_est == 59
    # per-epoch state is cells, not rows: epoch b1 has <= 6 bins for g
    cells = spark.read.parquet(state_dir)
    per_epoch = cells.groupBy("epoch", "event_type").count().collect()
    assert all(r["count"] <= 11 for r in per_epoch)


def test_streaming_hll_equals_batch_over_all_files(spark, tmp_path):
    from openstack_billing_from_db_spark.operators.sketch import (
        HLL_M,
        hll_distinct,
    )
    from openstack_billing_from_db_spark.streaming.sketch_stream import (
        read_hll_estimate,
        run_streaming_hll,
    )

    stream_dir = str(tmp_path / "events_stream")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    b1 = [("click", i) for i in range(120)] + [("view", 1), ("view", 2)]
    b2 = [("click", i) for i in range(60, 200)] + [("view", 2), ("view", 3)]
    _write_events(f"{stream_dir}/b1.parquet", b1)
    _write_events(f"{stream_dir}/b2.parquet", b2)

    run_streaming_hll(
        spark,
        stream_dir,
        "event_type string, user_id long",
        state_dir,
        ckpt,
        group_col="event_type",
        value_col="user_id",
    )
    streamed = {
        r.event_type: r
        for r in read_hll_estimate(
            spark, state_dir, group_col="event_type"
        ).collect()
    }
    batch = {
        r.event_type: r
        for r in hll_distinct(
            spark.createDataFrame(b1 + b2, "event_type string, user_id long"),
            group_col="event_type",
            value_col="user_id",
        ).collect()
    }
    assert set(streamed) == set(batch) == {"click", "view"}
    for g in batch:
        assert streamed[g].n_registers_used == batch[g].n_registers_used
        assert streamed[g].est_milli == batch[g].est_milli
    # state is bounded: at most HLL_M rows per group per epoch
    state = spark.read.parquet(state_dir)
    per_epoch = state.groupBy("epoch", "event_type").count().collect()
    assert all(r["count"] <= HLL_M for r in per_epoch)


def test_streaming_bootstrap_ci_equals_batch(spark, tmp_path):
    """The Poisson-bootstrap CI accumulated over micro-batches equals
    the batch CI over the union of all streamed rows — the sums-merge
    law operationalized (streaming/sketch_stream.run_streaming_bootstrap)."""
    from openstack_billing_from_db_spark.operators.sampling import (
        poisson_bootstrap_mean_ci,
    )
    from openstack_billing_from_db_spark.streaming.sketch_stream import (
        read_bootstrap_ci,
        run_streaming_bootstrap,
    )

    stream_dir = str(tmp_path / "docs_stream")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    batches = [
        [(i, (i * 37) % 1000) for i in range(0, 40)],
        [(i, (i * 91) % 1000) for i in range(40, 90)],
        [(i, (i * 13) % 1000) for i in range(90, 100)],
    ]
    os.makedirs(stream_dir, exist_ok=True)
    for j, rows in enumerate(batches):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "quality_micro": pa.array([r[1] for r in rows], pa.int64()),
                }
            ),
            f"{stream_dir}/b{j}.parquet",
        )

    run_streaming_bootstrap(
        spark,
        stream_dir,
        "doc_id long, quality_micro long",
        state_dir,
        ckpt,
        id_col="doc_id",
        value_col="quality_micro",
        n_replicas=16,
    )
    streamed = read_bootstrap_ci(spark, state_dir, n_replicas=16).collect()
    all_rows = [r for rows in batches for r in rows]
    batch = poisson_bootstrap_mean_ci(
        spark.createDataFrame(all_rows, "doc_id long, quality_micro long"),
        n_replicas=16,
    ).collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]
    assert streamed[0].n_replicas == 16


def test_streaming_priority_sample_equals_batch(spark, tmp_path):
    """Streamed weighted reservoir ≡ batch priority_sample over the
    union — including a heavy late arrival displacing earlier members
    at read time (the merge-and-truncate law for weighted sampling)."""
    from openstack_billing_from_db_spark.operators.sampling import (
        priority_sample,
    )
    from openstack_billing_from_db_spark.streaming.sketch_stream import (
        read_priority_sample,
        run_streaming_priority_sample,
    )

    stream_dir = str(tmp_path / "rows")
    state_dir = str(tmp_path / "pstate")
    ckpt = str(tmp_path / "ckpt")

    def _write(path, rows):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "key": pa.array([r[0] for r in rows], pa.int64()),
                    "weight": pa.array([r[1] for r in rows], pa.int64()),
                }
            ),
            path,
        )

    b0 = [(i, 1 + i % 7) for i in range(0, 30)]
    b1 = [(i, 1 + i % 7) for i in range(30, 60)]
    b2 = [(i, 1 + i % 7) for i in range(60, 80)] + [(999, 10_000_000)]
    _write(f"{stream_dir}/b0.parquet", b0)
    _write(f"{stream_dir}/b1.parquet", b1)
    _write(f"{stream_dir}/b2.parquet", b2)

    run_streaming_priority_sample(
        spark, stream_dir, "key long, weight long", state_dir, ckpt,
        key_col="key", weight_col="weight", k=K,
    )
    got = [
        (r.key, r.weight, r.priority, r.rnk)
        for r in read_priority_sample(spark, state_dir, k=K).collect()
    ]
    whole = spark.createDataFrame(b0 + b1 + b2, "key long, weight long")
    want = [
        (r.key, r.weight, r.priority, r.rnk)
        for r in priority_sample(
            whole, key_col="key", weight_col="weight", k=K
        ).collect()
    ]
    assert got == want and len(got) == K
    # the near-certain heavy member arrived in the LAST epoch
    assert any(key == 999 for key, *_ in got)
    # bounded state: every epoch partition holds at most K rows
    state = spark.read.parquet(state_dir)
    per_epoch = {
        r.epoch: r.n
        for r in state.groupBy("epoch").agg(F.count("*").alias("n")).collect()
    }
    assert per_epoch and all(n <= K for n in per_epoch.values())
