"""Derive the driver-verification rotation (_CHECK_PRIORITY) from the
committed CORRECTNESS_r*.json files instead of hand-sorting it each round.

The driver checks registry entries in iteration order and stops after a
~50-slot budget, so iteration order IS the verification schedule. The
rotation the judge asked for (VERDICT r04 ask #3):

  tier 0 — queries whose LATEST driver row failed (rows/schema/hash false
           or a real error): broken evidence gets re-checked first;
  tier 1 — queries with NO driver row in any round;
  tier 2 — queries rewritten AFTER their latest driver check (the
           hand-maintained plans/rewrites.py log, VERDICT r09 ask #2):
           their green evidence describes a shape that no longer exists;
  tier 3 — everything else, least-recently-checked round first.

Within a tier, oracle-backed queries outrank rows-only ones (an oracle
row is stronger evidence per budget slot), and registry-registration
order breaks the remaining ties so the output is stable.

Writes sales_forecast_pyspark_spark/plans/check_priority.py (imported by
plans/queries.py). tests/test_check_priority.py re-derives the same list
and fails if the committed module is stale, so "run this script after a
round lands or after registering a query" is enforced, not remembered.

Usage: python scripts/gen_check_priority.py [--check]
  --check: exit 1 if the committed module differs (no write).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(
    REPO, "sales_forecast_pyspark_spark", "plans", "check_priority.py"
)


def load_rounds(repo: str = REPO) -> dict[int, dict]:
    """{round_number: parsed CORRECTNESS json} for every committed round."""
    rounds = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def _row_failed(row: dict) -> bool:
    """A driver row is a failure if any tri-state check is explicitly
    false, or it errored with something other than the rows-only marker."""
    if any(row.get(k) is False for k in ("rows_match", "schema_match", "hash_match")):
        return True
    err = row.get("err")
    return err is not None and err != "no_oracle"


def derive_priority(
    registry_names: list[str],
    oracle_backed: set[str],
    rounds: dict[int, dict],
    rewritten_at: dict[str, int] | None = None,
) -> list[str]:
    rewritten_at = rewritten_at or {}
    reg_pos = {n: i for i, n in enumerate(registry_names)}
    last_checked: dict[str, int] = {}
    last_failed: dict[str, bool] = {}
    for rnd in sorted(rounds):
        for name, row in rounds[rnd].items():
            if name not in reg_pos:
                continue  # renamed/retired query in an old round
            last_checked[name] = rnd
            last_failed[name] = _row_failed(row)

    def key(name: str):
        if last_failed.get(name):
            tier = 0
        elif name not in last_checked:
            tier = 1
        elif last_checked[name] < rewritten_at.get(name, 0):
            tier = 2  # evidence predates the rewrite — re-verify next sweep
        else:
            tier = 3
        return (
            tier,
            last_checked.get(name, 0),
            0 if name in oracle_backed else 1,
            reg_pos[name],
        )

    return sorted(registry_names, key=key)


def expired_rewrites(
    rewritten_at: dict[str, int], rounds: dict[int, dict]
) -> list[str]:
    """Entries whose query has a driver row from a round >= the rewrite
    round — the evidence now covers the new shape, so the entry is inert
    and should be pruned from plans/rewrites.py."""
    last_checked: dict[str, int] = {}
    for rnd in sorted(rounds):
        for name in rounds[rnd]:
            last_checked[name] = max(last_checked.get(name, 0), rnd)
    return sorted(
        n for n, at in rewritten_at.items() if last_checked.get(n, 0) >= at
    )


def validate_rewrites(
    rewritten_at: dict[str, int], registry_names: list[str]
) -> list[str]:
    """Entries naming queries that are not registered (typo, or a
    retired query whose log entry outlived it). Callers must abort on a
    non-empty result — a misspelled entry would silently never promote."""
    return sorted(set(rewritten_at) - set(registry_names))


def _registry():
    sys.path.insert(0, REPO)
    from sales_forecast_pyspark_spark.plans.queries import QUERIES, REGISTRATION_ORDER
    from sales_forecast_pyspark_spark.plans.rewrites import REWRITTEN_AT

    names = list(REGISTRATION_ORDER)
    oracle_backed = {n for n in names if QUERIES[n].oracle is not None}
    unknown = validate_rewrites(REWRITTEN_AT, names)
    if unknown:
        raise SystemExit(
            f"plans/rewrites.py names unregistered queries: {unknown} — "
            "fix the typo or drop the retired entry"
        )
    return names, oracle_backed, dict(REWRITTEN_AT)


def render(
    priority: list[str],
    rounds: dict[int, dict],
    rewritten_at: dict[str, int] | None = None,
) -> str:
    rewritten_at = rewritten_at or {}
    lines = [
        '"""GENERATED by scripts/gen_check_priority.py — do not hand-edit.',
        "",
        "Driver-verification rotation derived from the committed",
        f"CORRECTNESS_r*.json rounds ({', '.join(f'r{r:02d}' for r in sorted(rounds))}):",
        "latest-check failures first, never-checked next, then queries",
        "rewritten after their latest check (plans/rewrites.py), then",
        "least-recently-checked; oracle-backed before rows-only within a",
        "tier; registration order breaks ties. Regenerate after each round",
        "lands, after registering a query, or after logging a rewrite:",
        "",
        "    python scripts/gen_check_priority.py",
        "",
        "tests/test_check_priority.py fails if this file is stale.",
        '"""',
        "",
        "# The CORRECTNESS rounds this rotation was derived from. When the",
        "# driver lands a NEWER round after this file was committed, the",
        "# staleness tests skip (pending regen) instead of failing — the hard",
        "# failure is reserved for rotations stale against rounds that",
        "# existed at commit time (VERDICT r06 ask #2).",
        f"DERIVED_FROM_ROUNDS = {sorted(rounds)!r}",
        "",
        "# Snapshot of plans/rewrites.py at derivation time. The staleness",
        "# test re-derives from THIS snapshot (not the live log), mirroring",
        "# the DERIVED_FROM_ROUNDS self-healing: a rewrite logged after this",
        "# file was committed makes a separate consistency test demand a",
        "# same-commit regen instead of hard-failing the derivation compare.",
        "DERIVED_FROM_REWRITES = "
        + repr({n: rewritten_at[n] for n in sorted(rewritten_at)}),
        "",
        "CHECK_PRIORITY = [",
    ]
    lines += [f'    "{n}",' for n in priority]
    lines += ["]", ""]
    return "\n".join(lines)


def main() -> int:
    check_only = "--check" in sys.argv
    names, oracle_backed, rewritten_at = _registry()
    rounds = load_rounds()
    for name in expired_rewrites(rewritten_at, rounds):
        print(
            f"note: rewrites.py entry '{name}' (r{rewritten_at[name]:02d}) is "
            "expired — driver evidence now covers the new shape; prune it"
        )
    priority = derive_priority(names, oracle_backed, rounds, rewritten_at)
    text = render(priority, rounds, rewritten_at)
    current = open(OUT_PATH).read() if os.path.exists(OUT_PATH) else None
    if check_only:
        if current != text:
            print("check_priority.py is STALE — run scripts/gen_check_priority.py")
            return 1
        print("check_priority.py up to date")
        return 0
    with open(OUT_PATH, "w") as f:
        f.write(text)
    print(f"wrote {OUT_PATH} ({len(priority)} queries, rounds={sorted(rounds)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
