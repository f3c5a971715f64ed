#!/bin/bash
# Round-5 tail v3: the r9d margin-widening experiment, serialized on the
# one chip / one CPU core.
#   1. r9d: tripled-corpus dequant finetune from the r9c PASS weights +
#      flagship gate re-run (scripts/run_r9d.sh; chunks self-commit f16
#      snapshots, gate appends to logs/eval_r9.txt)
#   2. full pytest suite -> committed CI-style log
# Each phase commits its own artifacts, so a mid-pipeline VM restart or
# session loss keeps everything up to that point.
# Usage: [R9D_HOURS=4] nohup bash scripts/round5_tail3.sh &
set -u
cd "$(dirname "$0")/.."
LOG=logs/round5_tail3.txt

echo "=== tail3 start at $(date -u) ===" >> "$LOG"

DEADLINE=$(( $(date +%s) + ${R9D_HOURS:-4} * 3600 )) \
  bash scripts/run_r9d.sh >> "$LOG" 2>&1

echo "=== pytest full suite at $(date -u) ===" >> "$LOG"
timeout 3600 python -m pytest tests/ -q > logs/pytest_r5b_full.txt 2>&1
rc=$?
echo "pytest exit $rc" >> "$LOG"
tail -3 logs/pytest_r5b_full.txt >> "$LOG"
git add logs/pytest_r5b_full.txt "$LOG" 2>/dev/null
git commit -q -m "round-5 r9d pipeline + full pytest log" || true
echo "=== tail3 complete at $(date -u) ===" >> "$LOG"
