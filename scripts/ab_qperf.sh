#!/bin/bash
# Alternating worktree A/B per the r13 lesson: >=4 alternating rounds,
# best-of-N in one session per side per round, CPU column primary.
# Usage: scripts/ab_qperf.sh <before_tree> <after_tree> <rounds> <n> q1 [q2 ...]
set -u
BEFORE=$1; AFTER=$2; ROUNDS=$3; N=$4; shift 4
QUERIES="$@"
for r in $(seq 1 "$ROUNDS"); do
  echo "=== round $r BEFORE ($BEFORE) ==="
  (cd "$BEFORE" && python scripts/qperf.py $QUERIES --n "$N" 2>/dev/null)
  echo "=== round $r AFTER ($AFTER) ==="
  (cd "$AFTER" && python scripts/qperf.py $QUERIES --n "$N" 2>/dev/null)
done
