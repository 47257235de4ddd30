#!/usr/bin/env python3
"""Regression tests for check_volatile.py's gate semantics.

Run: python3 tools/test_check_volatile.py (prints PASS per case; exit 1
on any failure). Plain stdlib — the test_bench_diff.py harness shape.

The tool is the round-close enforcement of the volatile-class same-code
bar (SCALE.md round-close checklist); its failure modes are a silent
rot of the de-noise protocol (false PASS) or a false alarm on a uniform
machine shift (false FAIL) — both frozen here.
"""
import json
import os
import subprocess
import sys
import tempfile

TOOL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "check_volatile.py")

BASE_QUERIES = {f"q{i}_case": 0.4 + 0.1 * i for i in range(8)}
VOLATILE = ["q2_case", "q6_case"]


def artifact(scale=1.0, bump=None, volatile=VOLATILE):
    qs = {k: round(v * scale, 3) for k, v in BASE_QUERIES.items()}
    if bump:
        name, factor = bump
        qs[name] = round(qs[name] * factor, 3)
    d = {"metric": "total", "value": round(sum(qs.values()), 2),
         "unit": "sec", "queries": qs, "sf": "sf0.1"}
    if volatile is not None:
        d["volatile"] = volatile
    return d


def run(old, new, *args):
    with tempfile.TemporaryDirectory() as td:
        op, np_ = os.path.join(td, "a.json"), os.path.join(td, "b.json")
        with open(op, "w") as f:
            json.dump(old, f)
        with open(np_, "w") as f:
            json.dump(new, f)
        r = subprocess.run([sys.executable, TOOL, op, np_, *args],
                           capture_output=True, text=True)
        return r.returncode, r.stdout


FAILURES = []


def case(name, got, want_rc, must=(), must_not=()):
    rc, out = got
    missing = [m for m in must if m not in out]
    present = [m for m in must_not if m in out]
    if rc != want_rc or missing or present:
        FAILURES.append(name)
        print(f"FAIL {name} (rc {rc}, wanted {want_rc})")
        if missing:
            print(f"  missing: {missing}")
        if present:
            print(f"  unexpectedly present: {present}")
        print("  ---- output ----")
        print("  " + out.replace("\n", "\n  "))
    else:
        print(f"PASS {name}")


# 1. Same-code flat double run: the healthy round-close outcome.
case("flat double run -> PASS, exit 0",
     run(artifact(), artifact()), 0, must=["PASS: volatile class"])

# 2. A volatile query at 1.5x while everything else is flat: the
# protocol-rot signal the check exists for — FAIL, query named.
case("volatile mover past the bar -> FAIL, exit 1, named",
     run(artifact(), artifact(bump=("q2_case", 1.5))), 1,
     must=["FAIL", "['q2_case']"], must_not=["'q6_case'"])

# 3. Uniform 1.3x machine shift carrying the volatile class with it:
# ambient normalization must keep this a PASS (no false alarm).
case("uniform shift -> normalized PASS",
     run(artifact(), artifact(scale=1.30)), 0,
     must=["ambient", "1.30x", "PASS"])

# 4. A NON-volatile mover does not fail the volatile gate (bench_diff's
# job, not this tool's).
case("non-volatile mover ignored",
     run(artifact(), artifact(bump=("q3_case", 2.0))), 0,
     must=["PASS"], must_not=["q3_case"])

# 5. Artifacts without the volatile field: can't check — explicit
# exit 2, never a silent PASS.
case("missing volatile list -> exit 2",
     run(artifact(volatile=None), artifact(volatile=None)), 2,
     must=["nothing to check"], must_not=["PASS:"])

# 6. Bar override: the same 1.5x mover passes a loosened 1.6 bar.
case("bar override honored",
     run(artifact(), artifact(bump=("q2_case", 1.5)), "1.6"), 0,
     must=["PASS"])

if FAILURES:
    sys.exit(f"{len(FAILURES)} case(s) failed: {FAILURES}")
print("all cases passed")
