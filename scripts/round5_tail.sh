#!/bin/bash
# Round-5 tail pipeline: serialize the remaining evidence work on the one
# chip / one CPU core after the r9b flagship-gate retry finishes.
#   1. wait for the r9b runner (pid file) to exit
#   2. bench validation (VERDICT r4 weak #2 + #5: capture stability,
#      batch-32 microbatch sweep, onestep headline)
#   3. full pytest suite -> committed CI-style log
# Each phase commits its own artifacts, so a mid-pipeline VM restart or
# session loss keeps everything up to that point.
# Usage: R9B_PID=$(cat /tmp/r9b.pid) bash scripts/round5_tail.sh
set -u
cd "$(dirname "$0")/.."
LOG=logs/round5_tail.txt

{
  echo "=== round5 tail start at $(date -u) (waiting on r9b pid ${R9B_PID:-none}) ==="
  if [ -n "${R9B_PID:-}" ]; then
    while kill -0 "$R9B_PID" 2>/dev/null; do sleep 30; done
  fi
  echo "=== r9b done; bench validation at $(date -u) ==="
} >> "$LOG" 2>&1

bash scripts/round5_bench_validation.sh >> "$LOG" 2>&1

echo "=== pytest full suite at $(date -u) ===" >> "$LOG"
timeout 2400 python -m pytest tests/ -q > logs/pytest_r5_full.txt 2>&1
rc=$?
echo "pytest exit $rc" >> "$LOG"
tail -3 logs/pytest_r5_full.txt >> "$LOG"
git add logs/pytest_r5_full.txt "$LOG" 2>/dev/null
git commit -q -m "round-5 full pytest log" || true
echo "=== round5 tail complete at $(date -u) ===" >> "$LOG"
