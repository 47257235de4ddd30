#!/usr/bin/env bash
# Round-close bench protocol: the SCALE.md checklist, executable.
#
# Runs the standing steps in order and stops at the first failure:
#   1. quiet-window full Bench run (unstamped)
#   2. same-code second run + check_volatile gate (<=1.20x normalized)
#   3. stamped canonical run (SPARK_GRAFT_STAMP=1 -> bench_full_r<N>.json)
#   4. bench_diff against the previous round's stamp
#   5. tool self-tests (always — they're seconds)
#
# The operator still owns judgment: read the load traces the runs print
# (median >> 4 means wait for a quieter window), and follow the
# isolated re-measure command bench_diff prints for load-correlated
# movers before writing any regression story. This script makes the
# SEQUENCE unforgettable, not the reading of it.
#
# Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/round_close.sh
set -euo pipefail
cd "$(dirname "$0")/.."

: "${SPARK_GRAFT_SF_DIR:?set SPARK_GRAFT_SF_DIR (e.g. /root/testdata/sf0.1)}"

echo "== round_close 1/5: quiet-window full run (unstamped)"
sbt -batch "runMain graft.Bench" | tail -1
cp bench_full.json /tmp/round_close_runA.json

echo "== round_close 2/5: same-code double run + volatile gate"
sbt -batch "runMain graft.Bench" | tail -1
cp bench_full.json /tmp/round_close_runB.json
python3 tools/check_volatile.py /tmp/round_close_runA.json \
  /tmp/round_close_runB.json

echo "== round_close 3/5: stamped canonical run"
SPARK_GRAFT_STAMP=1 sbt -batch "runMain graft.Bench" | tail -1
# sort -V: lexicographic sort mis-orders round numbers of different
# digit widths (r9 > r11 > r100), so past round 9 it would stamp-diff
# the wrong pair; version sort orders r9 < r11 < r100
stamp=$(ls bench_full_r*.json | sort -V | tail -1)
echo "stamped: $stamp"

echo "== round_close 4/5: diff vs previous round"
prev=$(ls bench_full_r*.json | sort -V | tail -2 | head -1)
if [ "$prev" != "$stamp" ]; then
  python3 tools/bench_diff.py "$prev" "$stamp"
else
  echo "no previous round stamp found - skipping diff"
fi

echo "== round_close 5/5: tool self-tests"
python3 tools/test_bench_diff.py
python3 tools/test_check_volatile.py

echo "round_close: done - commit $stamp and record the story in SCALE.md"
