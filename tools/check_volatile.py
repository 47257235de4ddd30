#!/usr/bin/env python3
"""Round-close volatile-class bar check.

Usage: python3 tools/check_volatile.py <runA.json> <runB.json> [bar]

Compares ONLY the ambient-volatile class (the artifacts' "volatile"
list — Bench.volatileClass: scoped-tmp state riders + tiny-partition
salted aggs) between two SAME-CODE full bench maps, against the class's
acceptance bar: every volatile query's ambient-normalized ratio must sit
within [1/bar, bar] (default 1.20). The bar is the round-14 enforcement
measurement (SCALE.md §Round-14: spread 1.00-1.09x after the de-noise
protocol, 1.40x before it); this tool makes re-checking it a standing
round-close step instead of a one-time measurement that silently rots.

Normalization: ratios divide out the median ratio of the NON-volatile
queries >=0.2s (the same ambient estimate bench_diff uses), so a
uniform machine shift between the two runs doesn't fail the class.

Unlike bench_diff (a lens), this IS a gate: exit 0 on PASS, 1 on FAIL,
2 when the inputs can't be checked (no volatile list, no common
volatile queries — old artifacts predate the field).
"""
import json
import statistics
import sys


def load(path):
    d = json.load(open(path))
    if "parsed" in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


def main(a_path, b_path, bar=1.20):
    a, b = load(a_path), load(b_path)
    aq, bq = a.get("queries", {}), b.get("queries", {})
    volatile = sorted(set(a.get("volatile") or []) |
                      set(b.get("volatile") or []))
    if not volatile:
        print("check_volatile: neither artifact carries a 'volatile' "
              "list (pre-round-14 artifact?) - nothing to check")
        return 2
    common = [k for k in volatile
              if aq.get(k, 0) > 0 and bq.get(k, 0) > 0]
    if not common:
        print(f"check_volatile: no volatile query present with positive "
              f"times in both maps (class: {volatile})")
        return 2
    others = [bq[k] / aq[k] for k in set(aq) & set(bq)
              if k not in volatile and aq[k] > 0 and bq[k] > 0
              and max(aq[k], bq[k]) >= 0.2]
    ambient = statistics.median(others) if len(others) >= 5 else 1.0
    print(f"ambient (non-volatile median, {len(others)} queries >=0.2s): "
          f"{ambient:.2f}x   bar: [{1 / bar:.2f}, {bar:.2f}] normalized")
    failures = []
    for k in common:
        raw = bq[k] / aq[k]
        norm = raw / ambient
        ok = 1 / bar <= norm <= bar
        if not ok:
            failures.append(k)
        print(f"  {'ok  ' if ok else 'FAIL'}  {k}: {aq[k]} -> {bq[k]} "
              f"(raw {raw:.2f}x, normalized {norm:.2f}x)")
    if failures:
        print(f"FAIL: {len(failures)} volatile quer"
              f"{'y' if len(failures) == 1 else 'ies'} outside the "
              f"{bar:.2f}x same-code bar: {failures} - the de-noise "
              "protocol (untimed state pre-warm + third shot) may have "
              "rotted; re-run Bench in a quiet window and inspect the "
              "per-shot arrays before trusting this round's numbers")
        return 1
    print(f"PASS: volatile class within the {bar:.2f}x same-code bar")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 1.20))
