"""Freeze-discipline gate (VERDICT r12 #3): a committed bench snapshot
must not carry a known-bad run — the r12 sf1 freeze shipped a
kcenter_select median of 102.3 s whose own ``min_sec`` floor was
39.8 s (one late-family JVM-pressure run inflating the headline ~9%).

Rule: REJECT a freeze where any line's median exceeds ``RATIO`` × its
own run minimum AND the absolute gap is larger than ``ABS_GAP`` seconds
(the absolute arm keeps sub-second lines from tripping on scheduler
jitter).  A flagged line means "re-run that family quietly" (e.g.
``SPARK_GRAFT_FAMILIES=similarity_extra python bench.py``), not "edit
the number": the snapshot is only committed once this gate passes.

    python tools/freeze_check.py BENCH_LOCAL.json
    python tools/freeze_check.py BENCH_SF1.json
"""

from __future__ import annotations

import json
import sys

RATIO = 2.5
ABS_GAP = 2.0  # seconds


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL.json"
    with open(path) as f:
        d = json.load(f)
    mins = d.get("min_sec", {})
    bad = []
    for q, med in d.get("queries", {}).items():
        mn = mins.get(q)
        if med is None or mn is None or mn <= 0:
            continue
        if med > RATIO * mn and med - mn > ABS_GAP:
            bad.append((q, med, mn))
    if bad:
        print(f"{path}: {len(bad)} line(s) violate the freeze rule "
              f"(median > {RATIO}x own min and gap > {ABS_GAP}s):")
        for q, med, mn in sorted(bad, key=lambda t: t[2] - t[1]):
            print(f"  {q}: median {med}s vs floor {mn}s "
                  f"({med / mn:.1f}x) — re-run its family")
        return 1
    print(f"{path}: freeze rule OK ({len(d.get('queries', {}))} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
