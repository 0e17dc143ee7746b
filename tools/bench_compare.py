"""Cross-round bench regression accounting.

Compares two bench.py artifacts (e.g. BENCH_LOCAL_r05.json vs
BENCH_LOCAL.json) under the repo's timing rules (BASELINE.md): per-query
deltas under 1.5x are noise; anything above is listed for investigation,
with added/removed queries accounted separately so totals are comparable.

Run: python tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]
Exit code 1 if any regression exceeds the threshold (CI-able).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    old = json.load(open(args.old))["queries"]
    new = json.load(open(args.new))["queries"]
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    ratios = []
    regressions = []
    for name in common:
        o, n = old[name], new[name]
        if o <= 0 or n <= 0:
            continue
        r = n / o
        ratios.append(r)
        if r > args.threshold:
            regressions.append((name, o, n, r))

    ratios.sort()
    median = ratios[len(ratios) // 2] if ratios else float("nan")
    ototal = sum(v for k, v in old.items() if k in common and v > 0)
    ntotal = sum(v for k, v in new.items() if k in common and v > 0)
    print(f"common queries: {len(common)}  added: {len(added)}  removed: {len(removed)}")
    print(f"common-subset total: {ototal:.1f}s -> {ntotal:.1f}s  (median ratio {median:.2f})")
    if added:
        print(f"added ({sum(new[a] for a in added if new[a] > 0):.1f}s): {', '.join(added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")
    if regressions:
        print(f"\nREGRESSIONS over {args.threshold}x:")
        for name, o, n, r in sorted(regressions, key=lambda x: -x[3]):
            print(f"  {name}: {o:.3f}s -> {n:.3f}s  ({r:.2f}x)")
        return 1
    print(f"no per-query regression above {args.threshold}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
