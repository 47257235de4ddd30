#!/usr/bin/env bash
# Round-open hygiene: commit the driver's round artifacts before new work.
#
# The driver drops/updates VERDICT.md, ADVICE.md, LEAKCHECK.json,
# BENCH_r<N>.json, CORRECTNESS_r<N>.json (and sometimes COPYCHECK.json)
# at round close/open. Three rounds in a row these sat uncommitted while
# feature work started, so every feature commit's diff carried unrelated
# artifact noise and the round-over-round history interleaved. Run this
# FIRST thing each round: it stages exactly the driver-artifact set,
# commits them on their own, and then prints whatever is still dirty so
# new work starts from a clean status.
#
# Safe to run when there is nothing to do (prints a note, exits 0).
set -euo pipefail
cd "$(dirname "$0")/.."

# Driver-owned round artifacts only — never stages source or docs the
# builder edits, so an accidental mid-round invocation cannot sweep
# unrelated work into the hygiene commit.
patterns=(VERDICT.md ADVICE.md LEAKCHECK.json COPYCHECK.json
          'BENCH_r*.json' 'CORRECTNESS_r*.json' 'bench_full_r*.json')

to_commit=()
for pat in "${patterns[@]}"; do
  # modified tracked files AND untracked new artifacts, expanded safely
  while IFS= read -r f; do
    [ -n "$f" ] && to_commit+=("$f")
  done < <(git status --porcelain -- $pat | sed 's/^...//')
done

if [ ${#to_commit[@]} -eq 0 ]; then
  echo "round_open: no uncommitted driver artifacts — already clean"
else
  git add -- "${to_commit[@]}"
  n=$(ls BENCH_r*.json 2>/dev/null | sed -E 's/.*_r0*([0-9]+)\.json/\1/' \
      | sort -n | tail -1)
  git commit -m "round ${n:-?} open: commit driver round artifacts" \
    -- "${to_commit[@]}"
  echo "round_open: committed ${#to_commit[@]} driver artifact(s)"
fi

echo "round_open: remaining working-tree status:"
git status --short || true
