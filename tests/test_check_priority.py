"""Pin the derived driver-verification rotation (VERDICT r04 ask #3).

The committed plans/check_priority.py must match what
scripts/gen_check_priority.py derives from the committed
CORRECTNESS_r*.json rounds, cover the registry exactly, and guarantee
that under the driver's ~50-slot budget no query's evidence goes more
than 2 rounds stale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from gen_check_priority import derive_priority, load_rounds  # noqa: E402

from sales_forecast_pyspark_spark.plans.check_priority import (  # noqa: E402
    CHECK_PRIORITY,
)
from sales_forecast_pyspark_spark.plans.queries import (  # noqa: E402
    QUERIES,
    REGISTRATION_ORDER,
)

BUDGET = 50  # the driver's observed per-round check budget


def test_priority_covers_registry_exactly():
    assert set(CHECK_PRIORITY) == set(REGISTRATION_ORDER), (
        "check_priority.py does not cover the registry — run "
        "scripts/gen_check_priority.py after registering/removing a query"
    )
    assert len(CHECK_PRIORITY) == len(set(CHECK_PRIORITY))


def test_priority_matches_derivation():
    oracle_backed = {n for n in REGISTRATION_ORDER if QUERIES[n].oracle is not None}
    derived = derive_priority(list(REGISTRATION_ORDER), oracle_backed, load_rounds())
    assert CHECK_PRIORITY == derived, (
        "check_priority.py is stale — run scripts/gen_check_priority.py"
    )


def test_queries_iteration_order_is_the_rotation():
    assert list(QUERIES) == list(CHECK_PRIORITY)


def test_no_query_goes_two_rounds_unchecked_under_budget():
    rounds = load_rounds()
    max_round = max(rounds)
    last_checked = {}
    for rnd in sorted(rounds):
        for name in rounds[rnd]:
            if name in QUERIES:
                last_checked[name] = rnd
    # After the NEXT sweep checks the first BUDGET slots at max_round+1,
    # every query outside the budget must have evidence no older than 2
    # rounds (checked at max_round-1 or later).
    stale = [
        n
        for n in CHECK_PRIORITY[BUDGET:]
        if last_checked.get(n, 0) < max_round - 1
    ]
    # When a single round registers MORE never-checked queries than one
    # sweep can absorb, the overflow is unavoidable by ordering alone;
    # the rotation must keep it minimal and spend it on the weakest
    # evidence class (rows-only queries, whose driver row is a count
    # either way — their correctness lives in pytest). Anything else
    # stale outside the budget is a real rotation bug.
    never_checked = [n for n in CHECK_PRIORITY if n not in last_checked]
    unavoidable = max(0, len(never_checked) - BUDGET)
    rows_only = {n for n in CHECK_PRIORITY if QUERIES[n].oracle is None}
    avoidable = [n for n in stale if n in last_checked or n not in rows_only]
    assert not avoidable and len(stale) <= unavoidable, (
        f"queries outside the {BUDGET}-slot budget would exceed 2 rounds "
        f"unchecked next round: {stale} (unavoidable overflow this round: "
        f"{unavoidable})"
    )
