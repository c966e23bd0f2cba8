"""Pin the bench harness's hand-maintained query lists against the live
registry (r11). The lists are the measurement protocol's foundation:
a renamed/retired query that silently falls out of BENCH_QUERIES
shrinks the board without anyone deciding that; one that falls out of
WARMUP_QUERIES reappears as a mystery cold-tax mover (exactly how
ann_pairs_topk read 18.7s on the r11 board vs a 5.4s warm median — it
was registered in r09 and never added to the warmup); a stale
bench_medians.HEAVIES entry breaks the medians protocol the round it's
needed. Registration is already test-gated (test_check_priority,
test_audit_docs) — this extends the same no-silent-drift rule to the
measurement side.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from bench import BENCH_QUERIES, MEASURED_SF_WARMUP, WARMUP_QUERIES  # noqa: E402
from bench_medians import HEAVIES  # noqa: E402

from sales_forecast_pyspark_spark.plans.queries import QUERIES  # noqa: E402


# Queries retired from the driver registry but deliberately KEPT on
# the bench board via a direct builder reference in bench.main() —
# board comparability across the retirement round (see the retirement
# note in plans/queries.py). An entry here must have that reference.
RETIRED_BUT_BENCHED = {"big_ticket_orders", "nation_trade_volume"}


def test_bench_queries_are_registered_and_unique():
    missing = [
        n
        for n in BENCH_QUERIES
        if n not in QUERIES and n not in RETIRED_BUT_BENCHED
    ]
    assert not missing, f"BENCH_QUERIES names unregistered queries: {missing}"
    assert len(BENCH_QUERIES) == len(set(BENCH_QUERIES))


def test_retired_benched_builders_exist():
    """The direct-reference contract: every RETIRED_BUT_BENCHED name
    must resolve to a callable builder in plans.queries (bench.main()
    injects it into its registry copy)."""
    import importlib

    q = importlib.import_module("sales_forecast_pyspark_spark.plans.queries")
    for name in RETIRED_BUT_BENCHED:
        assert name not in QUERIES  # actually retired
        assert callable(getattr(q, f"q_{name}"))


def test_warmup_queries_are_benched():
    """Warming a query that is never measured is wasted board time;
    warming an unregistered name is a silent no-op (bench.py guards
    with `if name in registry`) — both should fail loudly here."""
    not_benched = [n for n in WARMUP_QUERIES if n not in BENCH_QUERIES]
    assert not not_benched, f"warmed but not measured: {not_benched}"


def test_medians_heavies_are_registered():
    missing = [n for n in HEAVIES if n not in QUERIES]
    assert not missing, f"HEAVIES names unregistered queries: {missing}"


def test_measured_sf_warmup_queries_are_benched():
    """A measured-SF warm pass for a query that is never measured is
    pure wasted board time — same rule as WARMUP_QUERIES."""
    not_benched = [n for n in MEASURED_SF_WARMUP if n not in BENCH_QUERIES]
    assert not not_benched, f"warmed at SF but not measured: {not_benched}"
