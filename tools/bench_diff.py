#!/usr/bin/env python3
"""Round-over-round bench comparison over the FULL per-query maps.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [threshold]

Both inputs are bench_full_r<N>.json artifacts (or a BENCH_r<N>.json with
a "parsed" wrapper — detected automatically). Cross-session totals swing
with machine state (SCALE.md measures +/-20%, r11 measured a near-uniform
1.25x), so the tool first estimates the AMBIENT factor — the median
per-query ratio over common entries >=0.2s — and then reports every query
whose NORMALIZED ratio (raw ratio / ambient) moved more than `threshold`
(default 1.25x in either direction). A uniform slowdown therefore shows
up once, as the ambient line, instead of as 60 spurious per-query
regressions; a genuine per-query regression survives normalization.
When BOTH artifacts carry a "calib" trace (per-pass timings of Bench's
deterministic, IO-free xorshift calibration probe — identical work every
run, so its ratio measures host speed and never code), the tool compares
the ambient factor against the calibration ratio: agreement attributes a
uniform shift to the MACHINE; an ambient factor well above the
calibration ratio is a CODE-GLOBAL regression (session conf, codegen) —
the case the median alone cannot see. Round 19 adds a SECOND probe for
the class the single-thread one is blind to: "tcalib" (Bench's 8-thread
fixed scan+partition probe) measures THROUGHPUT-class host speed (core
competition, shared memory bandwidth) — in round 18 the single-thread
probe sat flat through a window where the same code re-ran 1.32x slower
than its own stamp, and the tool printed a false CODE-GLOBAL flag. With
both probes present, whichever ratio comes closest to explaining the
ambient factor arbitrates; CODE-GLOBAL is only suspected when the
best-explaining probe still leaves a residual past the band. Without
calib/tcalib on both sides the old caveat stands: a change that slows
EVERY query alike shifts the median exactly like machine drift — read
the load traces and ask whether the round's code plausibly touched
every query before accepting "machine".
Recorded system load (whole-run endpoints, plus the per-query trace when
the artifact carries one) is printed so ambient drift can be attributed.
Residuals near the 0.15 attribution band edge (within +/-0.05) print as
"borderline" in both directions instead of flipping between verdicts
run-to-run. Queries in either artifact's "volatile" list (the bench's
ambient-volatile class — measured same-code spread up to 1.40x) carry
an A/B-before-chasing caveat on their mover lines.
When queries moved, the exact isolated quiet-window re-measure command
for the top movers is printed under the list (the standing follow-up
for load-correlated movers, made self-documenting).
Exit code 0 always — this is a lens, not a gate.
The attribution semantics are frozen by tools/test_bench_diff.py (plain
python, no deps) — run it after editing the ambient/calibration logic.
"""
import json
import statistics
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
    loads = new.get("loads", {})
    if loads:
        # per-query loads are a list per shot (pass-separated protocol)
        # or a single float (older artifacts) — flatten either
        vals = []
        for v in loads.values():
            vals.extend(x for x in (v if isinstance(v, list) else [v])
                        if x >= 0)
        if vals:
            print(f"new-run per-shot load: min {min(vals):.2f}"
                  f"  median {statistics.median(vals):.2f}"
                  f"  max {max(vals):.2f}")
    # Machine-speed calibration: each probe is identical work every run,
    # so new/old of the per-pass MINIMUM (each run's least-disturbed
    # probe — transient steal inflates, nothing deflates) is a host
    # ratio the per-query ambient factor should match if the uniform
    # shift is machine and not code. TWO probes since round 19: the
    # single-thread CPU probe ("calib") sees steal/thermal on one core
    # but is BLIND to throughput-class contention (round 18: flat probe
    # through a 1.32x same-code window -> false CODE-GLOBAL flag), so
    # the 8-thread scan+partition probe ("tcalib") covers the parallel
    # resource class. A uniform shift is attributed to the machine when
    # EITHER probe's ratio explains it; CODE-GLOBAL needs both present
    # probes to read flat against the ambient factor.
    calib_ratio = None
    ocal = [c for c in (old.get("calib") or []) if c > 0]
    ncal = [c for c in (new.get("calib") or []) if c > 0]
    if ocal and ncal:
        calib_ratio = min(ncal) / min(ocal)
        print(f"calibration: {min(ocal):.3f}s -> {min(ncal):.3f}s  "
              f"(host speed ratio {calib_ratio:.2f}x; per-pass old="
              f"{[round(c, 2) for c in ocal]} new="
              f"{[round(c, 2) for c in ncal]})")
    tcal_ratio = None
    otc = [c for c in (old.get("tcalib") or []) if c > 0]
    ntc = [c for c in (new.get("tcalib") or []) if c > 0]
    if otc and ntc:
        tcal_ratio = min(ntc) / min(otc)
        print(f"throughput calibration: {min(otc):.3f}s -> "
              f"{min(ntc):.3f}s  (throughput-class host ratio "
              f"{tcal_ratio:.2f}x; per-pass old="
              f"{[round(c, 2) for c in otc]} new="
              f"{[round(c, 2) for c in ntc]})")
    both = sorted(set(oq) & set(nq))
    ratios = [nq[k] / oq[k] for k in both
              if oq[k] > 0 and nq[k] > 0 and max(oq[k], nq[k]) >= 0.2]
    ambient = statistics.median(ratios) if len(ratios) >= 5 else 1.0
    if len(ratios) >= 5:
        # A shifted ambient factor means EVERY query moved together.
        # With calibration on both sides the probe arbitrates between
        # machine drift and a code-global change; without it the tool
        # says what to check rather than asserting a cause.
        attribution = ""
        if abs(ambient - 1.0) > 0.1:
            probes = [(lbl, r) for lbl, r in
                      (("single-thread", calib_ratio),
                       ("throughput-class", tcal_ratio)) if r is not None]
            if not probes:
                attribution = ("  <- uniform shift: machine drift OR a "
                               "global change; check load traces and "
                               "whether code touched every query")
            else:
                # Symmetric residual: what's left of the uniform shift
                # after dividing out the measured host-speed change.
                # Direction matters — residual > 1 is a code-global
                # slowdown, residual < 1 a code-global SPEEDUP (e.g. a
                # costly session conf removed); the earlier asymmetric
                # branches labeled the speedup case "machine drift".
                # With two probes, the one whose ratio comes CLOSEST to
                # explaining the ambient factor arbitrates: a machine
                # verdict from either probe stands (they watch disjoint
                # resource classes), and a CODE-GLOBAL verdict is only
                # reachable when the best-explaining probe still leaves
                # an unexplained residual.
                probe_lbl, probe_ratio = min(
                    probes, key=lambda p: abs(ambient / p[1] - 1.0))
                hsr = f"{probe_lbl} host speed ratio {probe_ratio:.2f}x"
                residual = ambient / probe_ratio
                # Edge-of-band attributions are soft: with few eligible
                # queries the residual jitters run-to-run, and neither
                # probe covers every host resource class (IO contention
                # is outside both) — so a residual within +/-0.05 of
                # the 0.15 threshold gets a "borderline" label in BOTH
                # directions instead of flipping between verdicts.
                dist = abs(residual - 1.0)
                if dist <= 0.10:
                    attribution = (f"  <- matches {hsr}: machine drift")
                elif dist <= 0.20:
                    # the above-1 side keeps the CODE-GLOBAL wording
                    # (softened to "possible") so a regression hunt that
                    # greps for it still finds borderline slowdowns —
                    # the band must soften the verdict, not hide the
                    # direction (ADVICE r14)
                    side = (f"above {hsr} - possible CODE-GLOBAL "
                            "regression" if residual > 1 else
                            f"below {hsr}")
                    attribution = (f"  <- residual {residual:.2f}x is "
                                   f"borderline ({side}, near the 0.15 "
                                   "band edge): check load traces before "
                                   "calling it machine or code")
                elif residual > 1:
                    attribution = (f"  <- ambient {ambient:.2f}x exceeds "
                                   f"{hsr} "
                                   f"(residual {residual:.2f}x): "
                                   "CODE-GLOBAL regression suspected")
                else:
                    attribution = (f"  <- ambient {ambient:.2f}x is below "
                                   f"{hsr} "
                                   f"(residual {residual:.2f}x): "
                                   "CODE-GLOBAL improvement suspected "
                                   "(or the queries are less sensitive "
                                   "to this host change than the "
                                   "probes - check load traces)")
        print(f"ambient factor (median ratio, {len(ratios)} queries "
              f">=0.2s): {ambient:.2f}x" + attribution)
        if "CODE-GLOBAL regression suspected" in attribution:
            # Round-18 lesson: the single-thread calibration probe is
            # BLIND to throughput-class host contention — this exact
            # verdict fired on a window where the PREVIOUS round's tree,
            # rebuilt and re-run, was itself 1.32x slower than its own
            # stamp. The tcalib probe (round 19) covers that class when
            # both artifacts carry it, but neither probe sees IO
            # contention; the definitive instrument is still re-running
            # the old code in the current window.
            if tcal_ratio is None:
                print("  NOTE: no throughput probe on both sides - the "
                      "single-thread probe alone missed exactly this "
                      "shape in round 18 (1.32x same-code drift, probe "
                      "flat)")
            print("  before accepting a code-global verdict, re-run the "
                  "old tree in THIS window: tools/bench_ab.sh <oldRef> "
                  "- the same-window ratio is the verdict column")
    moved = []
    for k in both:
        a, b = oq[k], nq[k]
        if a <= 0 and b <= 0:
            # broken in BOTH rounds: not this round's regression — rank
            # below real movers so it never reads as a new failure
            moved.append((0.0, "STILL", k, a, b))
        elif b <= 0:
            moved.append((float("inf"), "FAIL ", k, a, b))  # newly failing
        elif a <= 0:
            moved.append((float("inf"), "FIXED", k, a, b))  # recovered
        elif max(a, b) >= 0.2:
            norm = (b / a) / ambient
            if norm > threshold or 1 / norm > threshold:
                moved.append((norm, f"{norm:5.2f}x", k, a, b))
    # Ambient-volatile class (Bench.volatileClass, carried as "volatile"
    # in round-14+ artifacts): queries whose SAME-CODE spread measured up
    # to 1.40x across windows (scoped-tmp state riders + tiny-partition
    # salted aggs). Their movements get a caveat, not silence — chase
    # them only after an alternating same-harness A/B.
    volatile = set(new.get("volatile") or []) | set(old.get("volatile") or [])
    for _, tag, k, a, b in sorted(moved, key=lambda t: -t[0]):
        shot = new.get("shots", {}).get(k)
        ld = loads.get(k)
        detail = ""
        if shot is not None:
            detail = f"  shots={shot}" + (f" load={ld}" if ld is not None
                                          else "")
        if k in volatile:
            detail += ("  [volatile class: same-code spread up to 1.40x "
                       "measured - A/B before chasing]")
        print(f"  {tag}  {k}: {a} -> {b}{detail}")
    if not moved:
        print(f"  no query moved more than {threshold}x normalized (>=0.2s)")
    # Load-correlated movers are the common case on this class of host —
    # the standing follow-up protocol is an ISOLATED quiet-window
    # re-measure of the top movers under the same harness (SCALE.md's
    # round-close checklist). Emit the exact command so the protocol is
    # self-documenting instead of tribal knowledge.
    top = sorted(((max(n, 1 / n), k) for n, _, k, _, _ in moved
                  if 0 < n < float("inf")), reverse=True)[:3]
    if top:
        names = ",".join(k for _, k in top)
        print("  re-measure the top movers in an isolated quiet window "
              "(same harness):")
        print(f"    SPARK_GRAFT_SF_DIR=$SPARK_GRAFT_SF_DIR "
              f"SPARK_GRAFT_QUERIES={names} "
              'sbt -batch "runMain graft.Bench"')
    for k in sorted(set(oq) - set(nq)):
        print(f"  only-old: {k} ({oq[k]}s)")
    for k in sorted(set(nq) - set(oq)):
        print(f"  only-new: {k} ({nq[k]}s)")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.25)
