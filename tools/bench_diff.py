"""Round-over-round bench comparison with mechanical noise attribution
(VERDICT r8 #3's "zero manual noise attribution" goal).

    python tools/bench_diff.py BENCH_LOCAL_prev.json BENCH_LOCAL.json

For every query present in both files it compares medians AND the
per-query run minima (``min_sec``, persisted since r9).  The minimum is
the isolated floor: ambient machine noise moves the median while the
floor stays put; a plan regression moves the floor itself.  Each
changed query (|median ratio − 1| > 0.3) is classified:

- REGRESSION: floor ratio > 1.3 too — the fastest run got slower, the
  plan (or its input) genuinely changed; investigate.
- NOISE: floor ratio <= 1.15 — the floor is stable, the median drift
  is run-to-run variance; no action.
- AMBIGUOUS: in between, or the older file has no min_sec column.

Exit code 1 if any REGRESSION, else 0 — usable as a gate.
"""

from __future__ import annotations

import json
import sys

MEDIAN_TRIGGER = 1.3
FLOOR_REGRESSION = 1.3
FLOOR_STABLE = 1.15


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    prev = json.load(open(sys.argv[1]))
    curr = json.load(open(sys.argv[2]))
    pq, cq = prev.get("queries", {}), curr.get("queries", {})
    pm, cm = prev.get("min_sec", {}), curr.get("min_sec", {})
    shared = sorted(
        k for k in pq if k in cq and pq[k] and cq[k]
    )
    print(f"shared queries: {len(shared)}")
    print(
        f"sum prev={sum(pq[k] for k in shared):.1f}s "
        f"curr={sum(cq[k] for k in shared):.1f}s"
    )
    regressions, noise, ambiguous = [], [], []
    for k in shared:
        r_med = cq[k] / pq[k]
        if max(r_med, 1 / r_med) <= MEDIAN_TRIGGER:
            continue
        f_prev, f_curr = pm.get(k), cm.get(k)
        if not f_prev or not f_curr:
            ambiguous.append((k, r_med, None))
            continue
        r_floor = f_curr / f_prev
        row = (k, r_med, r_floor)
        if r_med > 1 and r_floor > FLOOR_REGRESSION:
            regressions.append(row)
        elif max(r_floor, 1 / r_floor) <= FLOOR_STABLE:
            noise.append(row)
        else:
            ambiguous.append(row)
    for title, rows in (
        ("REGRESSION (floor moved)", regressions),
        ("NOISE (floor stable)", noise),
        ("AMBIGUOUS", ambiguous),
    ):
        if rows:
            print(f"\n{title}:")
            for k, r_med, r_floor in rows:
                fl = f"{r_floor:.2f}x" if r_floor else "n/a"
                print(f"  {k}: median {r_med:.2f}x, floor {fl}")
    if not (regressions or noise or ambiguous):
        print("\nno per-query median moved beyond the trigger — clean")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
