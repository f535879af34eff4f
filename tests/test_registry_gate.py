"""The driver's correctness gate checks only the first 50 ``queries()``
entries (observed round 1). Pin that every component-bearing query —
especially those that never got a CORRECTNESS row — sits inside the
gate, that only DEFERRED redundant twins absorb the overflow, and that
the rotation policy (every registered query driver-checked within two
rounds of registration) holds under the current DEFERRED ordering."""

import json
import re
from pathlib import Path

from openstack_billing_from_db_spark.registry import (
    DEFERRED,
    all_oracle_sql,
    all_queries,
)

GATE_SIZE = 50
REPO = Path(__file__).resolve().parents[1]

# never driver-checked yet — must sit inside the gate. Round-4's
# rotated-in set (q82/q86-q94) all got green CORRECTNESS_r04 rows; what
# remains is the round-4 operator wave (q95-q116), of which one
# representative per family rotates in for round 5 (VERDICT r4 Next #1).
# NEW components always take gate priority over multiply-proven twins.
NEVER_DRIVER_CHECKED = {
    "q95_pagerank",
    "q96_scd2_history",
    "q98_kmv_distinct",
    "q101_countmin_heavy_hitters",
    "q103_histogram_quantiles",
    "q104_random_projection",
    "q105_group_priority_sample",
    "q106_triangle_count",
    "q107_salted_join_revenue",
    "q109_contamination_fraction",
    "q110_pq_encode",
    "q112_ivf_pq_topk",
    "q114_pq_recall",
    "q116_lsh_recall",
}

# Registration round of queries added after round 1 that have not yet
# been driver-checked at the time of writing (earlier queries are all
# multiply-green, so their registration round never matters to the
# ledger). A query missing from this map is treated as registered in
# round 1 — the strictest assumption.
REGISTRATION_ROUND = {
    **{q: 4 for q in NEVER_DRIVER_CHECKED},
    "q97_merge_upsert": 4,
    "q99_priority_sample": 4,
    "q100_bpe_encode": 4,
    "q102_kmv_set_overlap": 4,
    "q108_quantile_trim": 4,
    "q111_pq_adc_topk": 4,
    "q113_ivf_pq_residual_topk": 4,
    "q115_sq8_profile": 4,
    # round-5 additions
    "q117_hll_distinct": 5,
    "q118_source_kl": 5,
    "q119_token_entropy": 5,
    "q120_edit_distance_dups": 5,
    "q121_js_divergence": 5,
    "q122_countmin_error": 5,
    "q123_set_similarity_join": 5,
    "q124_ams_f2": 5,
    "q125_concurrent_sessions": 5,
    "q126_source_cosine": 5,
    "q127_token_budget_epoch": 5,
    "q128_corpus_recipe": 5,
}


def _correctness_history() -> tuple[int, set[str]]:
    """(current round, names ever driver-green) from CORRECTNESS_r*.json."""
    green: set[str] = set()
    last = 0
    for path in REPO.glob("CORRECTNESS_r*.json"):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", path.name)
        if not m:
            continue
        last = max(last, int(m.group(1)))
        rows = json.loads(path.read_text())
        green |= {
            name
            for name, row in rows.items()
            if row.get("err") is None and row.get("rows_match")
        }
    return last + 1, green


def test_unchecked_queries_inside_gate():
    names = list(all_queries())
    gate = set(names[:GATE_SIZE])
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


def test_rotation_ledger_two_round_deadline():
    """Every registered query must receive a driver CORRECTNESS row
    within two rounds of registration. Operationally: a query that has
    never been driver-green and whose two-round grace has elapsed must
    sit inside the gate head NOW (so this round's run checks it). Red if
    a new query would be parked past its deadline by the current
    DEFERRED ordering."""
    current_round, green = _correctness_history()
    names = list(all_queries())
    gate = set(names[:GATE_SIZE])
    overdue = [
        q
        for q in names
        if q not in green
        and q not in gate
        and current_round >= REGISTRATION_ROUND.get(q, 1) + 2
    ]
    assert not overdue, (
        f"never driver-checked, past the 2-round deadline, and still "
        f"deferred: {overdue}"
    )


def test_ledger_history_is_read():
    """Guard the ledger's own inputs: the history parser must see the
    prior rounds and the multiply-green core queries."""
    current_round, green = _correctness_history()
    assert current_round >= 5
    assert "q01_billing_invoice" in green
    assert "q94_incremental_dedup" in green  # r4 rotation landed
