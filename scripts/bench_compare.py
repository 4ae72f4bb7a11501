"""Round-over-round bench regression check.

Usage: python scripts/bench_compare.py OLD_detail.json [NEW_detail.json]

Compares per-query wall times between two bench_detail.json files
(NEW defaults to ./bench_detail.json) over their COMMON query set and
prints: common-set totals, the ratio, and any query slower than
REGRESSION_X with its before/after times. Exit code 1 if regressions
exist — wire into gate.sh when a baseline detail file is kept.

The driver only records the compact summary line (BENCH_r{N}.json);
keeping the previous round's bench_detail.json around (it is written
by every bench.py run, gitignored) is what makes per-query
round-over-round attribution possible — the r7 verdict had to recover
this from ad-hoc gate logs.
"""

from __future__ import annotations

import json
import sys

REGRESSION_X = 1.5
MIN_ABS_SEC = 0.05  # ignore sub-50ms noise


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))["queries"]
    new_path = sys.argv[2] if len(sys.argv) > 2 else "bench_detail.json"
    new = json.load(open(new_path))["queries"]
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries")
        return 2
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(
        f"common queries: {len(common)}  old={t_old:.3f}s  "
        f"new={t_new:.3f}s  ratio={t_new / max(t_old, 1e-9):.2f}x"
    )
    regressions = [
        (q, old[q], new[q])
        for q in common
        if new[q] > REGRESSION_X * old[q] and new[q] - old[q] > MIN_ABS_SEC
    ]
    for q, a, b in sorted(regressions, key=lambda x: x[1] - x[2]):
        print(f"  REGRESSION {q}: {a:.3f}s -> {b:.3f}s ({b / a:.1f}x)")
    if not regressions:
        print("no per-query regressions >", REGRESSION_X, "x")
    print(f"new-only queries: {len(set(new) - set(old))}")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
