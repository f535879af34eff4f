"""The driver's correctness gate checks only the first 50 ``queries()``
entries (observed round 1). Pin that every component-bearing query —
especially those that never got a CORRECTNESS row — sits inside the
gate, that only DEFERRED redundant twins absorb the overflow, and that
the rotation policy (every registered query driver-checked within two
rounds of registration) holds under the current DEFERRED ordering.

Registration rounds come from the committed append-only ledger
``openstack_billing_from_db_spark/registration_ledger.json`` (VERDICT r5
Next #5): a query missing from the ledger is a hard failure here, so a
round-N addition cannot be silently mis-dated.
"""

import json
import re
from pathlib import Path

from openstack_billing_from_db_spark.registry import (
    DEFERRED,
    all_oracle_sql,
    all_queries,
    registration_rounds,
)

GATE_SIZE = 50
REPO = Path(__file__).resolve().parents[1]


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


def test_ledger_covers_registry_exactly():
    """Every registered query has a ledger entry and vice versa — the
    append-only ledger cannot drift from the registry."""
    names = set(all_queries())
    ledger = registration_rounds()
    missing = names - set(ledger)
    stale = set(ledger) - names
    assert not missing, f"queries registered without a ledger entry: {sorted(missing)}"
    assert not stale, f"ledger entries for unregistered queries: {sorted(stale)}"


def test_ledger_rounds_sane():
    current_round, _ = _correctness_history()
    for name, rnd in registration_rounds().items():
        assert 1 <= rnd <= current_round, (name, rnd, current_round)


def test_unchecked_queries_inside_gate():
    """Strong rotation policy: EVERY query that has never received a
    driver CORRECTNESS row must sit inside the 50-entry gate head NOW,
    so this round's run checks it. (The 2-round deadline below is the
    formal backstop; this is the operative forcing function — if a round
    registers more new queries than free slots, more multiply-green
    twins must be parked.)"""
    _, green = _correctness_history()
    names = list(all_queries())
    gate = set(names[:GATE_SIZE])
    never_checked = {q for q in names if q not in green}
    missing = never_checked - gate
    assert not missing, f"never driver-checked yet outside the gate: {sorted(missing)}"


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
    reg = registration_rounds()
    names = list(all_queries())
    gate = set(names[:GATE_SIZE])
    overdue = [
        q
        for q in names
        if q not in green
        and q not in gate
        and current_round >= reg.get(q, 1) + 2
    ]
    assert not overdue, (
        f"never driver-checked, past the 2-round deadline, and still "
        f"deferred: {overdue}"
    )


def test_ledger_history_is_read():
    """Guard the ledger's own inputs: the history parser must see the
    prior rounds and the multiply-green core queries."""
    current_round, green = _correctness_history()
    assert current_round >= 6
    assert "q01_billing_invoice" in green
    assert "q94_incremental_dedup" in green  # r4 rotation landed
    assert "q110_pq_encode" in green  # r5 rotation landed


def test_query_entry_releases_prior_persisted_caches(spark, sf_dir):
    """Sequential gate sessions must not accumulate 50 queries' worth of
    cached blocks: invoking a registered query releases the PREVIOUS
    query's tracked persists (its result was already materialized by
    the sequential caller; an unpersisted DataFrame only recomputes)."""
    from openstack_billing_from_db_spark.operators import caching
    from openstack_billing_from_db_spark.registry import all_queries

    qs = all_queries()
    caching.release_persisted_caches()
    df = qs["q37_simhash_near_dups"](spark, sf_dir)  # persists internally
    df.limit(1).collect()
    assert len(caching._TRACKED) > 0
    qs["q15_distinct_brand_sizes"](spark, sf_dir)  # plain agg, no persists
    assert len(caching._TRACKED) == 0
