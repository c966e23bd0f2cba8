"""Mechanical per-query bench regression check: compare a BENCH JSON
against the previous round's, flagging queries slower than a threshold
ratio (default 1.5x, the BENCH_BASELINE.md rule) after normalizing for
whole-run drift (machine variance shows up as a shared multiplier).

Usage: python scripts/bench_diff.py BENCH_r02.json BENCH_r03.json [1.5]
Exit code 1 if any query regresses beyond the threshold.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    def load(path):
        d = json.load(open(path))
        # the driver's BENCH_r{N}.json wraps the bench line under "parsed"
        if "queries" not in d and isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        return d

    old = load(sys.argv[1])
    new = load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old_q = old.get("queries") or {}
    new_q = new.get("queries") or {}
    shared = sorted(set(old_q) & set(new_q))
    if not shared:
        print("no shared queries to compare")
        return 2
    # normalize out whole-run drift with the median per-query ratio
    ratios = sorted(new_q[q] / old_q[q] for q in shared if old_q[q] > 0)
    drift = ratios[len(ratios) // 2]
    print(f"shared queries: {len(shared)}; median drift x{drift:.2f}")
    bad = []
    for q in shared:
        if old_q[q] <= 0:
            continue
        norm = (new_q[q] / old_q[q]) / drift
        flag = "REGRESSED" if norm > threshold else ""
        print(f"{q:28s} {old_q[q]:7.2f}s -> {new_q[q]:7.2f}s  x{norm:.2f} {flag}")
        if norm > threshold:
            bad.append(q)
    only_new = sorted(set(new_q) - set(old_q))
    if only_new:
        print("new queries (no baseline):", ", ".join(only_new))
    if bad:
        print("REGRESSIONS:", bad)
        return 1
    print("no per-query regression beyond "
          f"x{threshold} after drift normalization")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
