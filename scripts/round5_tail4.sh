#!/bin/bash
# Round-5 tail v4: resume the r9d pipeline with denser val cadence.
#
# tail3 ran chunk 1 with WRITE_EVERY=50; on the 5x corpus epochs are ~44 s,
# so a 4200 s chunk fits ~75 epochs and the ONLY mid-chunk val lands at
# epoch 50 — one model_best opportunity per 70 min.  tail4 restarts the
# same run_r9d.sh pipeline from the chunk-1 preempt snapshot with
# WRITE_EVERY=20 (vals at 20/40/60, ~20 s each: finer best-selection for
# the same wall cost) and keeps tail3's ORIGINAL deadline so the gate +
# pytest tail still fits the round.
# Usage: DEADLINE=<unix-s> nohup bash scripts/round5_tail4.sh &
set -u
cd "$(dirname "$0")/.."
LOG=logs/round5_tail3.txt

echo "=== tail4 resume at $(date -u) (deadline $(date -ud @${DEADLINE:?} +%H:%M)) ===" >> "$LOG"

# Chunk-1 calibration (logs/stage3_diff_r9d.txt): epochs ~30-35 s on the
# 5x corpus, full-TrainState saves block ~2 min (375 MB device_get through
# the tunnel), boundary drag ~5 min.  So: ONE long chunk (TRAIN_TIMEOUT
# 8400 + near-now DEADLINE; CHUNK=4000 keeps the epoch limit from ending
# it early), vals every 20 epochs (~11 min apart), default 0.2% save
# threshold — worst case ~17% save overhead, and model_best stays within
# one val of the frontier for the gate.
WRITE_EVERY=20 TRAIN_TIMEOUT=8400 CHUNK=4000 \
  DEADLINE=$DEADLINE bash scripts/run_r9d.sh >> "$LOG" 2>&1

echo "=== pytest full suite at $(date -u) ===" >> "$LOG"
timeout 3600 python -m pytest tests/ -q > logs/pytest_r5b_full.txt 2>&1
rc=$?
echo "pytest exit $rc" >> "$LOG"
tail -3 logs/pytest_r5b_full.txt >> "$LOG"
git add logs/pytest_r5b_full.txt "$LOG" 2>/dev/null
git commit -q -m "round-5 r9d pipeline + full pytest log" || true
echo "=== tail4 complete at $(date -u) ===" >> "$LOG"
