"""Unit tests for the round-4 curation operators (operators/curation.py)
on hand-built inputs with hand-computed expectations; oracle parity for
the registered q89-q93 queries is covered by test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.functions.hashing import py_hash64
from openstack_billing_from_db_spark.operators.curation import (
    bloom_positions,
    build_bloom_bitset,
    bloom_probe,
    fixed_segments,
    linear_logit_micro,
    token_chunks,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_chunks_exact_boundaries(spark):
    # 7 tokens, chunk 3 stride 2 -> starts 0,2,4,6
    df = _docs(spark, [(1, "a b c d e f g")])
    got = {
        (r.chunk_id, r.n_tokens, r.chunk_text)
        for r in token_chunks(df, chunk_size=3, stride=2).collect()
    }
    assert got == {
        (0, 3, "a b c"),
        (1, 3, "c d e"),
        (2, 3, "e f g"),
        (3, 1, "g"),
    }


def test_token_chunks_short_and_empty_docs(spark):
    df = _docs(spark, [(1, "x y"), (2, ""), (3, "   ")])
    rows = token_chunks(df, chunk_size=5, stride=4).collect()
    # empty docs emit nothing; short doc emits exactly one short chunk
    assert [(r.doc_id, r.chunk_id, r.chunk_text) for r in rows] == [(1, 0, "x y")]


def test_token_chunks_exact_multiple_no_phantom_tail(spark):
    # 4 tokens, chunk=stride=2: starts 0,2 only (no empty chunk at 4)
    df = _docs(spark, [(1, "a b c d")])
    rows = token_chunks(df, chunk_size=2, stride=2).collect()
    assert sorted((r.chunk_id, r.chunk_text) for r in rows) == [
        (0, "a b"),
        (1, "c d"),
    ]


def test_fixed_segments_are_nonoverlapping_partition(spark):
    df = _docs(spark, [(7, "a b c d e")])
    rows = sorted(
        (r.seg_idx, r.seg_text) for r in fixed_segments(df, seg_size=2).collect()
    )
    assert rows == [(0, "a b"), (1, "c d"), (2, "e")]


def test_bloom_bitset_bounds_and_sign_bit():
    # bit 63 exercises the signed-long reinterpretation
    bits = build_bloom_bitset([0, 63, 64, 127], m_bits=128)
    assert len(bits) == 2
    assert bits[0] == (1 | (1 << 63)) - (1 << 64)  # negative: sign bit set
    assert bits[1] == (1 | (1 << 63)) - (1 << 64)
    with pytest.raises(ValueError):
        build_bloom_bitset([128], m_bits=128)


def test_bloom_probe_no_false_negatives_and_rejects_unset(spark):
    m, k = 1024, 3
    df = spark.createDataFrame([(h,) for h in range(200)], "gh long")
    pos = df.select("gh", *bloom_positions(F.col("gh"), k, m))
    members = pos.filter(F.col("gh") < 100)
    member_positions = [
        r.pos
        for r in members.select(
            F.explode(F.array("bfpos0", "bfpos1", "bfpos2")).alias("pos")
        ).collect()
    ]
    bitset = build_bloom_bitset(member_positions, m)
    surv = {
        r.gh for r in bloom_probe(pos, bitset, ["bfpos0", "bfpos1", "bfpos2"]).collect()
    }
    # every member survives (no false negatives)...
    assert set(range(100)) <= surv
    # ...and the filter actually rejects (some non-members fail the probe)
    assert len(surv) < 200


def test_bloom_positions_match_python_hash_family(spark):
    # the Spark-side positions are the same md5 family the oracle uses
    df = spark.createDataFrame([(12345,)], "gh long")
    row = df.select(*bloom_positions(F.col("gh"), 2, 64)).collect()[0]
    assert row.bfpos0 == py_hash64("bf0|12345") % 64
    assert row.bfpos1 == py_hash64("bf1|12345") % 64


def test_linear_logit_micro_matches_python(spark):
    df = spark.createDataFrame([(3, 10), (0, -4)], "f1 long, f2 long")
    out = df.select(
        linear_logit_micro({"f1": 7, "f2": -2}, 100).alias("logit")
    ).collect()
    assert [r.logit for r in out] == [100 + 7 * 3 - 2 * 10, 100 + 7 * 0 - 2 * -4]


def test_segment_dedup_keeps_first_occurrence(spark, tmp_path):
    # two docs sharing a segment: doc 1 (earlier packed position) keeps it
    df = _docs(
        spark,
        [
            (1, "dup seg one two unique a b c"),
            (2, "dup seg one two other x y z"),
        ],
    )
    path = str(tmp_path / "documents.parquet")
    df.withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.mode("overwrite").parquet(path)
    from openstack_billing_from_db_spark.plans.curation_queries import (
        q92_segment_dedup,
    )

    rows = {r.doc_id: r for r in q92_segment_dedup(spark, str(tmp_path)).collect()}
    # seg size 8: each doc is exactly one 8-token segment... both unique
    assert rows[1].n_kept == 1 and rows[2].n_kept == 1
    # now a true duplicate: identical 8-token prefix segments
    df2 = _docs(
        spark,
        [
            (1, "a b c d e f g h tail1 x"),
            (2, "a b c d e f g h tail2 y"),
        ],
    )
    df2.withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.mode("overwrite").parquet(path)
    rows = {r.doc_id: r for r in q92_segment_dedup(spark, str(tmp_path)).collect()}
    assert (rows[1].n_kept, rows[1].n_removed) == (2, 0)  # first occurrence
    assert (rows[2].n_kept, rows[2].n_removed) == (1, 1)  # shared seg removed


# --- incremental near-dup dedup ----------------------------------------------


def _mini_corpus(spark):
    return _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different words about spark shuffles and joins"),
            # near-dup of doc 1 (one token changed)
            (30, "the quick brown fox jumps over the lazy cat today"),
            # unique new doc
            (31, "nothing like anything else in this tiny corpus at all"),
        ],
    )


def test_incremental_dedup_finds_index_match(spark):
    from openstack_billing_from_db_spark.operators.dedup import (
        incremental_near_duplicates,
        minhash_index,
    )

    docs = _mini_corpus(spark)
    index = minhash_index(docs.filter("doc_id < 10"))
    new = minhash_index(docs.filter("doc_id >= 10"))
    rows = {r.new_id: r for r in incremental_near_duplicates(index, new).collect()}
    assert set(rows) == {30, 31}
    # 30 matches its near-identical sibling 1
    assert rows[30].match_id == 1 and rows[30].is_dup
    assert rows[30].n_agree >= 6
    assert abs(rows[30].est_jaccard - rows[30].n_agree / 12) < 1e-12
    # 31 collides with nothing: NULL match, not a dup
    assert rows[31].match_id is None and rows[31].n_agree is None
    assert rows[31].is_dup is False


def test_incremental_dedup_exact_dup_full_agreement(spark):
    from openstack_billing_from_db_spark.operators.dedup import (
        incremental_near_duplicates,
        minhash_index,
    )

    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (50, "alpha beta gamma delta epsilon zeta eta theta"),
        ],
    )
    index = minhash_index(docs.filter("doc_id = 1"))
    new = minhash_index(docs.filter("doc_id = 50"))
    (row,) = incremental_near_duplicates(index, new).collect()
    assert (row.new_id, row.match_id, row.n_agree) == (50, 1, 12)
    assert row.est_jaccard == 1.0 and row.is_dup


def test_incremental_dedup_matches_within_new_batch(spark):
    from openstack_billing_from_db_spark.operators.dedup import (
        incremental_near_duplicates,
        minhash_index,
    )

    docs = _docs(
        spark,
        [
            (1, "index doc with its own unrelated content words here"),
            (40, "twin text shared by two new arrivals in one batch"),
            (41, "twin text shared by two new arrivals in one batch"),
        ],
    )
    index = minhash_index(docs.filter("doc_id = 1"))
    new = minhash_index(docs.filter("doc_id >= 40"))
    rows = {r.new_id: r for r in incremental_near_duplicates(index, new).collect()}
    # the batch dedups against itself: each twin's best match is the other
    assert rows[40].match_id == 41 and rows[40].is_dup
    assert rows[41].match_id == 40 and rows[41].is_dup


def test_minhash_index_short_docs_have_no_rows(spark):
    from openstack_billing_from_db_spark.operators.dedup import minhash_index

    docs = _docs(spark, [(1, "one two"), (2, "")])  # below shingle_n=3
    assert minhash_index(docs).count() == 0


def test_merge_index_admits_only_unique_docs(spark):
    from openstack_billing_from_db_spark.operators.dedup import (
        incremental_near_duplicates,
        merge_index,
        minhash_index,
    )

    day0 = _docs(spark, [(1, "the quick brown fox jumps over the lazy dog today")])
    day1 = _docs(
        spark,
        [
            (30, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
            (31, "an entirely fresh document with novel words in it"),  # unique
        ],
    )
    day2 = _docs(spark, [(60, "an entirely fresh document with novel words in it")])

    idx = minhash_index(day0)
    new1 = minhash_index(day1)
    v1 = incremental_near_duplicates(idx, new1)
    idx = merge_index(idx, new1, v1)
    # dup doc 30 never entered the index; unique doc 31 did
    assert set(r.doc_id for r in idx.select("doc_id").distinct().collect()) == {1, 31}

    # a later copy of 31's text matches the canonical survivor 31
    new2 = minhash_index(day2)
    (row,) = incremental_near_duplicates(idx, new2).collect()
    assert (row.new_id, row.match_id, row.is_dup) == (60, 31, True)


def test_table_stats_one_row_per_column(spark, sf_dir):
    from openstack_billing_from_db_spark.sources.stats import table_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    stats = {r.column: r for r in table_stats(ev).collect()}
    assert set(stats) == set(ev.columns)
    n = ev.count()
    for r in stats.values():
        assert r.n_rows == n
    # exact facts to pin: event_id unique and non-null
    assert stats["event_id"].n_nulls == 0
    ndv = stats["event_id"].approx_ndv
    assert abs(ndv - n) / n < 0.15  # rsd=0.05 approx distinct
    assert int(stats["event_id"].min_repr) == ev.agg(F.min("event_id")).collect()[0][0]


def test_table_stats_nulls_and_complex_types(spark):
    from openstack_billing_from_db_spark.sources.stats import table_stats

    df = spark.createDataFrame(
        [(1, None, [1, 2]), (2, "x", None)],
        "a long, s string, arr array<int>",
    )
    stats = {r.column: r for r in table_stats(df).collect()}
    assert stats["s"].n_nulls == 1
    assert stats["arr"].n_nulls == 1
    # complex types carry no min/max but still count
    assert stats["arr"].min_repr is None and stats["arr"].max_repr is None
    assert stats["a"].min_repr == "1" and stats["a"].max_repr == "2"


def test_adaptive_bloom_bits_power_of_two_and_sql_twin(spark):
    from openstack_billing_from_db_spark.operators.curation import (
        BLOOM_MAX_BITS,
        BLOOM_MIN_BITS,
        adaptive_bloom_bits,
        adaptive_bloom_bits_sql,
    )

    assert adaptive_bloom_bits(0) == BLOOM_MIN_BITS
    assert adaptive_bloom_bits(8192) == BLOOM_MIN_BITS  # 8*8192 = 2^16
    assert adaptive_bloom_bits(8193) == BLOOM_MIN_BITS * 2
    assert adaptive_bloom_bits(10**12) == BLOOM_MAX_BITS

    import duckdb

    con = duckdb.connect()
    for n in (0, 1, 8192, 8193, 100_000, 10**7):
        sql = adaptive_bloom_bits_sql(f"SELECT {n}")
        assert con.sql(f"SELECT {sql}").fetchone()[0] == adaptive_bloom_bits(n)


def test_bloom_distributed_build_equals_naive(spark):
    from openstack_billing_from_db_spark.operators.curation import (
        bloom_positions,
        build_bloom_bitset,
        build_bloom_bitset_distributed,
    )

    df = spark.createDataFrame([(h,) for h in range(300)], "gh long")
    mp = df.select(
        F.explode(F.array(*bloom_positions(F.col("gh"), 3, 2048))).alias("pos")
    )
    naive = build_bloom_bitset([r.pos for r in mp.collect()], 2048)
    assert build_bloom_bitset_distributed(mp, 2048) == naive


def test_bloom_arrow_probe_equals_literal_probe(spark):
    from openstack_billing_from_db_spark.operators.curation import (
        _bloom_probe_arrow,
        bloom_positions,
        bloom_probe,
        build_bloom_bitset_distributed,
    )

    df = spark.createDataFrame([(h,) for h in range(400)], "gh long")
    pos = df.select("gh", *bloom_positions(F.col("gh"), 3, 2048))
    members = pos.filter(F.col("gh") < 200).select(
        F.explode(F.array("bfpos0", "bfpos1", "bfpos2")).alias("pos")
    )
    bits = build_bloom_bitset_distributed(members, 2048)
    cols = ["bfpos0", "bfpos1", "bfpos2"]
    lit = {r.gh for r in bloom_probe(pos, bits, cols).collect()}
    arrow = {r.gh for r in _bloom_probe_arrow(pos, bits, cols).collect()}
    assert lit == arrow
    assert set(range(200)) <= lit


def test_bloom_probe_auto_picks_by_size(spark):
    from openstack_billing_from_db_spark.operators import curation

    df = spark.createDataFrame([(1,)], "gh long")
    pos = df.select("gh", *curation.bloom_positions(F.col("gh"), 2, 64))
    small = [0] * 1  # 64 bits -> literal path (no Arrow node)
    plan = curation.bloom_probe_auto(
        pos, small, ["bfpos0", "bfpos1"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    big = [0] * ((curation.LITERAL_BITSET_MAX_BITS // 64) + 1)
    plan = curation.bloom_probe_auto(
        pos, big, ["bfpos0", "bfpos1"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan


# --- greedy sequence packing (round 10) ---------------------------------------


def _pack_rows(spark, rows, budget):
    from openstack_billing_from_db_spark.operators.curation import greedy_pack_bins

    df = spark.createDataFrame(rows, "shard long, doc_id long, n_tokens long")
    got = greedy_pack_bins(df, budget=budget).collect()
    return {(r.shard, r.doc_id): (r.n_tokens, r.bin) for r in got}


def test_greedy_pack_exact_fit_stays_in_bin(spark):
    # 100 + 156 == budget exactly -> same bin; the next token overflows
    rows = [(0, 1, 100), (0, 2, 156), (0, 3, 1)]
    got = _pack_rows(spark, rows, budget=256)
    assert got == {(0, 1): (100, 0), (0, 2): (156, 0), (0, 3): (1, 1)}


def test_greedy_pack_oversize_doc_gets_own_bin(spark):
    # doc 2 exceeds the budget: it still lands in ONE bin (opened fresh
    # because doc 1 filled bin 0 past the fit), and doc 3 must not join it
    rows = [(0, 1, 200), (0, 2, 999), (0, 3, 10)]
    got = _pack_rows(spark, rows, budget=256)
    assert got == {(0, 1): (200, 0), (0, 2): (999, 1), (0, 3): (10, 2)}


def test_greedy_pack_oversize_first_doc(spark):
    # an oversize FIRST doc occupies bin 0 alone
    rows = [(0, 1, 999), (0, 2, 10)]
    got = _pack_rows(spark, rows, budget=256)
    assert got == {(0, 1): (999, 0), (0, 2): (10, 1)}


def test_greedy_pack_shards_independent_and_matches_replay(spark):
    import random

    rng = random.Random(148)
    rows = [
        (shard, doc_id, rng.randint(0, 120))
        for shard in range(4)
        for doc_id in range(rng.randint(5, 40))
    ]
    budget = 256
    got = _pack_rows(spark, rows, budget=budget)

    # independent pure-python replay of the greedy rule, per shard
    expected = {}
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for shard, doc_id, w in rows:
        by_shard.setdefault(shard, []).append((doc_id, w))
    for shard, docs in by_shard.items():
        acc, b = 0, 0
        for i, (doc_id, w) in enumerate(sorted(docs)):
            if i > 0 and acc + w > budget:
                b += 1
                acc = w
            else:
                acc += w
            expected[(shard, doc_id)] = (w, b)
    assert got == expected
    # every bin respects the budget unless it holds a single oversize doc
    from collections import defaultdict

    bins = defaultdict(list)
    for (shard, _doc), (w, b) in got.items():
        bins[(shard, b)].append(w)
    for ws in bins.values():
        assert sum(ws) <= budget or len(ws) == 1


def test_tune_pack_shards_contract():
    from openstack_billing_from_db_spark.operators.curation import tune_pack_shards

    # floor at min_shards for small corpora (the fixture regime)
    assert tune_pack_shards(0) == 8
    assert tune_pack_shards(5_000) == 8
    assert tune_pack_shards(100_000) == 8
    # ceil(n / target) beyond it
    assert tune_pack_shards(1_000_000) == 16
    assert tune_pack_shards(10**9) == -(-(10**9) // 65_536)
    assert tune_pack_shards(100, target_docs_per_shard=10, min_shards=1) == 10
    with pytest.raises(ValueError):
        tune_pack_shards(-1)
    with pytest.raises(ValueError):
        tune_pack_shards(10, target_docs_per_shard=0)
    with pytest.raises(ValueError):
        tune_pack_shards(10, min_shards=0)
