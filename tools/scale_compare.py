"""Compare two bench snapshots (e.g. sf0.1 vs sf1) per query → the
scaling table for SCALE.md (VERDICT r6 #4).

    python tools/scale_compare.py BENCH_LOCAL.json /tmp/BENCH_SF1.json

Prints per-query (t_small, t_big, factor) sorted by factor descending,
plus per-family sums, flagging queries whose factor exceeds the data
ratio (super-linear candidates — worth an isolated look before blaming
the plan: constant JVM/plan overhead deflates small-sf numbers, so a
factor ≤ the data ratio is AT WORST linear)."""

from __future__ import annotations

import json
import sys


def main() -> int:
    small_path, big_path = sys.argv[1], sys.argv[2]
    a = json.load(open(small_path))
    b = json.load(open(big_path))
    ratio = (b.get("sf") or 1.0) / (a.get("sf") or 0.1)
    qa, qb = a["queries"], b["queries"]
    rows = []
    for k in qa:
        if k in qb and qa[k] and qb[k]:
            rows.append((k, qa[k], qb[k], qb[k] / qa[k]))
    rows.sort(key=lambda r: -r[3])
    print(f"data ratio {ratio:.0f}x — {len(rows)} shared queries")
    print(f"{'query':42s} {'small':>8s} {'big':>8s} {'factor':>7s}")
    for k, ts, tb, f in rows:
        flag = "  <-- super-linear" if f > ratio else ""
        print(f"{k:42s} {ts:8.2f} {tb:8.2f} {f:6.1f}x{flag}")
    fa, fb = a.get("families", {}), b.get("families", {})
    print("\nfamilies:")
    for k in fa:
        if k in fb and fa[k]:
            print(f"{k:24s} {fa[k]:8.1f} {fb[k]:8.1f} {fb[k] / fa[k]:6.1f}x")
    sa = sum(t for _, t, _, _ in rows)
    sb = sum(t for _, _, t, _ in rows)
    print(f"\nshared sum: {sa:.1f} -> {sb:.1f} s ({sb / sa:.1f}x at {ratio:.0f}x data)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
