#!/bin/bash
# Pin-protocol preflight (BASELINE.md "Pin protocol", round 7).
# Run BEFORE starting a 3-run bench pin. Exits non-zero when a
# protocol precondition fails:
#   1. Driver artifacts (BENCH_r*.json / CORRECTNESS_r*.json /
#      BENCH_LOCAL*.json) must all be TRACKED — rounds 5 and 6 both
#      shipped with the newest round's artifacts sitting untracked in
#      the worktree (the verdicts flagged it twice; this check is the
#      automation the round-6 verdict asked for).
#   2. The worktree must be clean (a pin on uncommitted source is a
#      pin nobody can reproduce).
#   3. The machine must be idle: 1-minute loadavg below 4 on this
#      32-core box — a pin taken hot after evidence sweeps carries the
#      round-6 uniform-drift class (diagnosed 1.18x).
set -u
cd "$(dirname "$0")/.."
fail=0

untracked=$(git status --porcelain -- 'BENCH_r*.json' 'CORRECTNESS_r*.json' 'BENCH_LOCAL*.json' | grep '^??' || true)
if [ -n "$untracked" ]; then
  echo "FAIL: untracked driver artifacts (git add them first):"
  echo "$untracked"
  fail=1
fi

dirty=$(git status --porcelain -- src build.sbt project | head -5)
if [ -n "$dirty" ]; then
  echo "FAIL: uncommitted source — a pin must be on committed code:"
  echo "$dirty"
  fail=1
fi

load=$(awk '{print $1}' /proc/loadavg)
if awk -v l="$load" 'BEGIN { exit !(l >= 4.0) }'; then
  echo "FAIL: loadavg $load >= 4 — machine not idle (wait for sweeps/" \
       "tests to drain; the round-6 drift class)."
  fail=1
fi

if [ "$fail" -eq 0 ]; then
  echo "preflight OK: artifacts tracked, source committed, loadavg $load"
fi
exit $fail
