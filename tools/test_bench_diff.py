#!/usr/bin/env python3
"""Regression tests for bench_diff.py's attribution semantics.

Run: python3 tools/test_bench_diff.py   (prints PASS per case; exit 1 on
any failure). Plain stdlib — no pytest in this environment.

Why this exists: the calibration attribution had a real asymmetry bug
(a uniform code-global SPEEDUP — ambient below a flat host-speed ratio
— was labeled "machine drift" by a branch whose wording only fit a
slowed host). The semantics are now frozen here as executable cases:
each builds two synthetic bench_full artifacts and asserts on the
attribution line the tool prints. The tool is a lens the round-over-
round performance story leans on; its failure mode is a WRONG STORY,
which no Spark-side spec can catch.
"""
import json
import os
import subprocess
import sys
import tempfile

TOOL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "bench_diff.py")

BASE_QUERIES = {f"q{i}_case": 0.4 + 0.1 * i for i in range(8)}


def artifact(scale=1.0, calib=None, bump=None, volatile=None, tcalib=None):
    """A synthetic bench_full map: BASE_QUERIES x scale, one optional
    per-query bump on top, optional per-pass calib/tcalib traces,
    optional volatile-class list."""
    qs = {k: round(v * scale, 3) for k, v in BASE_QUERIES.items()}
    if bump:
        name, factor = bump
        qs[name] = round(qs[name] * factor, 3)
    d = {"metric": "total", "value": round(sum(qs.values()), 2),
         "unit": "sec", "queries": qs, "load": [1.0, 1.0], "sf": "sf0.1"}
    if calib is not None:
        d["calib"] = [round(calib * f, 3) for f in (1.02, 1.0, 1.01, 1.0, 1.03)]
    if tcalib is not None:
        d["tcalib"] = [round(tcalib * f, 3)
                       for f in (1.05, 1.0, 1.02, 1.01, 1.08)]
    if volatile is not None:
        d["volatile"] = volatile
    return d


def run(old, new):
    with tempfile.TemporaryDirectory() as td:
        op, np_ = os.path.join(td, "old.json"), os.path.join(td, "new.json")
        with open(op, "w") as f:
            json.dump(old, f)
        with open(np_, "w") as f:
            json.dump(new, f)
        r = subprocess.run([sys.executable, TOOL, op, np_],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        return r.stdout


FAILURES = []


def case(name, out, must, must_not=()):
    missing = [m for m in must if m not in out]
    present = [m for m in must_not if m in out]
    if missing or present:
        FAILURES.append(name)
        print(f"FAIL {name}")
        if missing:
            print(f"  missing: {missing}")
        if present:
            print(f"  unexpectedly present: {present}")
        print("  ---- output ----")
        print("  " + out.replace("\n", "\n  "))
    else:
        print(f"PASS {name}")


# 1. Uniform slowdown WITH a matching host-speed shift: machine drift.
out = run(artifact(calib=0.85), artifact(scale=1.30, calib=0.85 * 1.30))
case("uniform+calib-matches -> machine drift", out,
     must=["machine drift"],
     must_not=["CODE-GLOBAL", "bench_ab"])

# 2. Uniform slowdown on a FLAT host: code-global regression.
out = run(artifact(calib=0.85), artifact(scale=1.45, calib=0.85))
case("uniform+calib-flat -> code-global regression", out,
     # the suspected-regression verdict must carry the round-18
     # stronger-instrument pointer (re-run the old tree in this window)
     must=["CODE-GLOBAL regression suspected", "tools/bench_ab.sh"],
     must_not=["improvement", "machine drift"])

# 3. Uniform SPEEDUP on a flat host: code-global improvement — the case
# the pre-fix asymmetric branches mislabeled as machine drift.
out = run(artifact(calib=0.85), artifact(scale=0.70, calib=0.85))
case("uniform-speedup+calib-flat -> code-global improvement", out,
     must=["CODE-GLOBAL improvement suspected"],
     must_not=["regression suspected", "machine drift", "bench_ab"])

# 4. Calib on one side only: the tool must fall back to the honest
# can't-tell caveat, not invent an attribution.
out = run(artifact(), artifact(scale=1.30, calib=0.85))
case("calib-one-side -> can't-tell caveat", out,
     must=["machine drift OR a global change"],
     must_not=["CODE-GLOBAL", "host speed ratio"])

# 5. A single genuine mover must survive ambient normalization and be
# named; the flat queries must not be listed as movers.
out = run(artifact(calib=0.85),
          artifact(scale=1.0, calib=0.85, bump=("q3_case", 3.0)))
case("single mover named, flat queries not", out,
     must=["q3_case"],
     must_not=["q1_case:", "CODE-GLOBAL"])

# 6. Nothing moved: no attribution suffix at all, explicit quiet line.
out = run(artifact(calib=0.85), artifact(scale=1.0, calib=0.85))
case("flat run -> no attribution, quiet line", out,
     must=["no query moved more than"],
     must_not=["CODE-GLOBAL", "machine drift"])

# 7. Residual near the band edge (uniform 1.30x on a 1.15x host ->
# residual ~1.13, inside (1.10, 1.20]): borderline, never a hard verdict
# that flips run-to-run — but the ABOVE side keeps the CODE-GLOBAL
# wording (softened to "possible") so regression hunts that grep for it
# still find borderline slowdowns (ADVICE r14).
out = run(artifact(calib=0.85), artifact(scale=1.30, calib=0.85 * 1.15))
case("residual near band edge -> borderline, not a verdict", out,
     must=["borderline", "check load traces",
           "possible CODE-GLOBAL regression"],
     must_not=["regression suspected", "machine drift"])

# 7b. The mirror side: uniform 0.85x speedup on a flat host -> residual
# ~0.85 (dist ~0.15, at the old hard threshold), borderline from below —
# no CODE-GLOBAL tag (the grep hook is for regressions only; a
# borderline speedup must not ring the regression bell).
out = run(artifact(calib=0.85), artifact(scale=0.85, calib=0.85))
case("borderline below the band edge", out,
     # since r19 the message names the arbitrating probe
     must=["borderline", "below single-thread host speed ratio"],
     must_not=["CODE-GLOBAL", "machine drift"])

# 8. A mover in the artifact's volatile class carries the A/B caveat;
# a non-volatile mover does not.
out = run(artifact(calib=0.85, volatile=["q3_case"]),
          artifact(scale=1.0, calib=0.85, bump=("q3_case", 3.0),
                   volatile=["q3_case"]))
case("volatile mover carries the A/B caveat", out,
     must=["q3_case", "volatile class", "A/B before chasing"])
out = run(artifact(calib=0.85, volatile=["q1_case"]),
          artifact(scale=1.0, calib=0.85, bump=("q3_case", 3.0),
                   volatile=["q1_case"]))
case("non-volatile mover carries no caveat", out,
     must=["q3_case"],
     must_not=["volatile class"])

# 9. Movers emit the exact isolated re-measure command (the standing
# follow-up for load-correlated movers, self-documenting); a flat run
# emits none. Top movers are ranked by movement in EITHER direction.
out = run(artifact(calib=0.85),
          artifact(scale=1.0, calib=0.85, bump=("q3_case", 3.0)))
case("movers emit the quiet-window re-measure command", out,
     must=["re-measure the top movers",
           "SPARK_GRAFT_QUERIES=q3_case",
           'sbt -batch "runMain graft.Bench"'])
out = run(artifact(calib=0.85), artifact(scale=1.0, calib=0.85))
case("flat run emits no re-measure command", out,
     must=["no query moved more than"],
     must_not=["SPARK_GRAFT_QUERIES", "re-measure"])
# two movers, one a big SPEEDUP: both named, biggest movement first
two = artifact(scale=1.0, calib=0.85, bump=("q3_case", 2.0))
two["queries"]["q5_case"] = round(two["queries"]["q5_case"] / 4.0, 3)
out = run(artifact(calib=0.85), two)
case("re-measure ranks |movement| across both directions", out,
     must=["SPARK_GRAFT_QUERIES=q5_case,q3_case"])

# 10. THE ROUND-18 FALSE ALARM, reproduced: uniform 1.30x ambient, the
# single-thread probe FLAT (it was 0.81-0.86 through the whole episode),
# but the throughput probe moved with the ambient factor — the window
# had throughput-class contention (the r17 tree itself re-ran 1.32x
# slower than its own stamp). Pre-r19 this printed "CODE-GLOBAL
# regression suspected" and cost a worktree A/B to refute; with tcalib
# on both sides it must attribute to the MACHINE.
out = run(artifact(calib=0.85, tcalib=1.0),
          artifact(scale=1.30, calib=0.85, tcalib=1.30))
case("r18 shape: flat 1-thread + moved throughput -> machine drift", out,
     must=["machine drift", "throughput-class"],
     must_not=["CODE-GLOBAL", "bench_ab"])

# 10b. Both probes flat under a uniform slowdown: now the code-global
# verdict is EARNED (no probe explains it), and the bench_ab pointer
# still prints — but not the single-probe blindness note, which only
# applies when tcalib is missing on a side.
out = run(artifact(calib=0.85, tcalib=1.0),
          artifact(scale=1.45, calib=0.85, tcalib=1.0))
case("both probes flat -> code-global regression earned", out,
     must=["CODE-GLOBAL regression suspected", "tools/bench_ab.sh"],
     must_not=["machine drift", "NOTE: no throughput probe"])

# 10c. tcalib on ONE side only (the r18->r19 stamp transition shape):
# the tool must fall back to single-thread-only semantics AND flag that
# the throughput probe can't arbitrate — the r18 lesson note.
out = run(artifact(calib=0.85),
          artifact(scale=1.45, calib=0.85, tcalib=1.0))
case("tcalib one side -> 1-thread semantics + blindness note", out,
     must=["CODE-GLOBAL regression suspected",
           "NOTE: no throughput probe"],
     must_not=["machine drift"])

# 10d. Throughput probe moved but ambient moved MORE: the residual over
# the best-explaining probe still exceeds the band -> code-global on
# top of real host drift (both effects named by the ratios printed).
out = run(artifact(calib=0.85, tcalib=1.0),
          artifact(scale=1.80, calib=0.85, tcalib=1.25))
case("ambient far past both probes -> still code-global", out,
     must=["CODE-GLOBAL regression suspected"],
     must_not=["machine drift"])

if FAILURES:
    sys.exit(f"{len(FAILURES)} case(s) failed: {FAILURES}")
print("all cases passed")
