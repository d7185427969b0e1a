#!/usr/bin/env python3
"""Compare two bench artifacts (BENCH_r*.json) and flag real movers.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--threshold 0.2]

A query is flagged when it moved more than `threshold` (relative) AND
more than 0.5 s (absolute) — the absolute floor keeps the
planning/codegen noise at small SF from flagging (CLAUDE.md: residual
per-query time at sf0.1 is mostly job-floor overhead). Iterative queries
(median-of-3 since round 5) are annotated: single-run artifacts from
older rounds carry ±2 s noise for them (SCALE.md).
"""

from __future__ import annotations

import json
import sys

ITERATIVE = {"dedup_clusters", "pagerank", "semantic_dedup"}
ABS_FLOOR_SEC = 0.5


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    # driver BENCH_r*.json wraps the bench line under "parsed";
    # raw bench.py output is the object itself
    old = json.load(open(sys.argv[1]))
    old = old.get("parsed", old)
    new = json.load(open(sys.argv[2]))
    new = new.get("parsed", new)
    thr = float(sys.argv[4]) if len(sys.argv) > 4 else (
        float(sys.argv[3].split("=", 1)[1]) if len(sys.argv) > 3 and "=" in sys.argv[3]
        else 0.2
    )
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    flagged = []
    for name in shared:
        a, b = oq[name], nq[name]
        if abs(b - a) > ABS_FLOOR_SEC and abs(b - a) / max(a, 1e-9) > thr:
            flagged.append((name, a, b))
    flagged.sort(key=lambda t: -(t[2] - t[1]))

    tot_a = sum(oq[n] for n in shared)
    tot_b = sum(nq[n] for n in shared)
    print(f"shared queries: {len(shared)}  total {tot_a:.1f}s -> {tot_b:.1f}s "
          f"({(tot_b - tot_a) / max(tot_a, 1e-9) * 100:+.0f}%)")
    if added:
        print(f"added: {', '.join(f'{n} ({nq[n]:.1f}s)' for n in added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")
    if not flagged:
        print(f"no shared query moved >{thr:.0%} and >{ABS_FLOOR_SEC}s")
        return
    print(f"\nmovers (> {thr:.0%} and > {ABS_FLOOR_SEC}s):")
    for name, a, b in flagged:
        note = "  [iterative: ±2s single-run noise]" if name in ITERATIVE else ""
        print(f"  {name:28s} {a:7.2f}s -> {b:7.2f}s ({(b - a) / a * 100:+.0f}%){note}")
    if any(n not in ITERATIVE for n, _, _ in flagged):
        sys.exit(1)  # real (non-iterative) mover -> non-zero for CI use


if __name__ == "__main__":
    main()
