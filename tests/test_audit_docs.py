"""Audit-doc staleness gates: PLANS.md and COVERAGE.md are generated /
hand-maintained views over the query registry, and r05 proved they rot —
the copurchase_triangles BNLJ landed in a snapshot commit precisely
because PLANS.md wasn't regenerated with the registration. These tests
make a lagging audit doc a suite failure, so docs regenerate in the same
commit that registers a query.
"""

from __future__ import annotations

import re
from pathlib import Path

from sales_forecast_pyspark_spark.plans.queries import QUERIES

REPO = Path(__file__).resolve().parent.parent


def test_plans_md_covers_exactly_the_registry():
    """Every registered query appears in PLANS.md — either as an audited
    table row or on the explicit Skipped line — and PLANS.md names no
    query that is no longer registered."""
    text = (REPO / "PLANS.md").read_text()
    rows = set(re.findall(r"^\| (\w+) \|", text, flags=re.MULTILINE)) - {"query"}
    m = re.search(r"^Skipped \(model-fitting at plan time\): (.+)$", text, re.MULTILINE)
    assert m, "PLANS.md lost its Skipped line — regenerate with scripts/audit_plans.py"
    skipped = {s.strip() for s in m.group(1).split(",")}
    documented = rows | skipped
    registered = set(QUERIES)
    assert documented == registered, (
        f"PLANS.md is stale — run `python scripts/audit_plans.py`. "
        f"missing={sorted(registered - documented)} "
        f"extra={sorted(documented - registered)}"
    )


def test_coverage_md_header_counts_match_registry():
    """COVERAGE.md's headline counts (total / oracle-checked / rows-only)
    must equal the live registry's."""
    text = (REPO / "COVERAGE.md").read_text()
    m = re.search(
        r"(\d+) registered queries: (\d+) DuckDB-oracle-checked.*?(\d+) rows-only",
        text,
        re.DOTALL,
    )
    assert m, "COVERAGE.md lost its count header"
    total, oracle, rows_only = (int(g) for g in m.groups())
    live_total = len(QUERIES)
    live_oracle = sum(1 for q in QUERIES.values() if q.oracle is not None)
    assert (total, oracle, rows_only) == (
        live_total,
        live_oracle,
        live_total - live_oracle,
    ), (
        f"COVERAGE.md header says {total}/{oracle}/{rows_only}, registry is "
        f"{live_total}/{live_oracle}/{live_total - live_oracle} — update the header"
    )
