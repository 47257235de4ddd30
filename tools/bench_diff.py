#!/usr/bin/env python3
"""Round-over-round bench comparison over the FULL per-query maps.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [threshold]

Both inputs are bench_full_r<N>.json artifacts (or a BENCH_r<N>.json with
a "parsed" wrapper — detected automatically). Prints totals, recorded
system load, and every query whose time changed by more than `threshold`
(default 1.25x in either direction, ignoring sub-0.2s entries where JVM
noise dominates), plus entries present on only one side. Exit code 0
always — this is a lens, not a gate: cross-session totals swing with
machine state (SCALE.md measures +/-20%), so the load line is printed
precisely so a drifted total can be attributed before any plan is blamed.
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    if "parsed" in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


def main(old_path, new_path, threshold=1.25):
    old, new = load(old_path), load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"total: {old.get('value')} -> {new.get('value')} s"
          f"  (queries: {len(oq)} -> {len(nq)})")
    if old.get("load") or new.get("load"):
        print(f"load:  {old.get('load')} -> {new.get('load')}")
    both = sorted(set(oq) & set(nq))
    moved = []
    for k in both:
        a, b = oq[k], nq[k]
        if b <= 0:
            moved.append((float("inf"), "FAIL ", k, a, b))  # newly failing
        elif a <= 0:
            moved.append((float("inf"), "FIXED", k, a, b))  # recovered
        elif max(a, b) >= 0.2 and (b / a > threshold or a / b > threshold):
            moved.append((b / a, f"{b / a:5.2f}x", k, a, b))
    for _, tag, k, a, b in sorted(moved, key=lambda t: -t[0]):
        print(f"  {tag}  {k}: {a} -> {b}")
    if not moved:
        print(f"  no query moved more than {threshold}x (>=0.2s)")
    for k in sorted(set(oq) - set(nq)):
        print(f"  only-old: {k} ({oq[k]}s)")
    for k in sorted(set(nq) - set(oq)):
        print(f"  only-new: {k} ({nq[k]}s)")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.25)
