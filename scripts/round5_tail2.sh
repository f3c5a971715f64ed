#!/bin/bash
# Round-5 tail v2: serialize the remaining round-5 work on the one chip /
# one CPU core after the bench-validation sweep finishes.
#   1. wait for the bench-validation script (pid via WAIT_PID) to exit
#   2. r9c: mel-weighted dequant finetune + flagship gate retry
#      (scripts/run_r9c.sh; chunks commit their own f16 snapshots)
#   3. full pytest suite -> committed CI-style log
# Each phase commits its own artifacts, so a mid-pipeline VM restart or
# session loss keeps everything up to that point.
# Usage: WAIT_PID=<pid> [R9C_HOURS=4] nohup bash scripts/round5_tail2.sh &
set -u
cd "$(dirname "$0")/.."
LOG=logs/round5_tail2.txt

{
  echo "=== tail2 start at $(date -u) (waiting on pid ${WAIT_PID:-none}) ==="
  if [ -n "${WAIT_PID:-}" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  fi
  echo "=== bench validation done; r9c at $(date -u) ==="
} >> "$LOG" 2>&1

DEADLINE=$(( $(date +%s) + ${R9C_HOURS:-4} * 3600 )) \
  bash scripts/run_r9c.sh >> "$LOG" 2>&1

echo "=== pytest full suite at $(date -u) ===" >> "$LOG"
timeout 3600 python -m pytest tests/ -q > logs/pytest_r5_full.txt 2>&1
rc=$?
echo "pytest exit $rc" >> "$LOG"
tail -3 logs/pytest_r5_full.txt >> "$LOG"
git add logs/pytest_r5_full.txt "$LOG" 2>/dev/null
git commit -q -m "round-5 full pytest log" || true
echo "=== tail2 complete at $(date -u) ===" >> "$LOG"
