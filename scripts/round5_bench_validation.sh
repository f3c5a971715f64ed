#!/bin/bash
# Round-5 bench validation (VERDICT r4 weak #2 + weak #5), run with the TPU
# otherwise idle:
#   - capture stability: two consecutive bench.py runs must land within
#     +-0.5x of each other (the min-of-k-windows fix)
#   - batch-32 VMEM spill: per-example throughput at batch 32 with
#     --microbatch 16 vs plain batch 32 vs batch 16
#   - onestep production-chain headline refresh
# Usage: bash scripts/round5_bench_validation.sh
set -u
cd "$(dirname "$0")/.."
LOG=logs/bench_r5.txt

{
  echo "=== round5 bench validation at $(date -u) ==="
  echo "--- capture stability: consecutive fresh-process runs ---"
  for i in 1 2; do
    echo "run $i:"; timeout 3600 python bench.py
  done
  echo "--- batch sweep: 16 / 32 plain / 32 microbatch16 ---"
  echo "batch 16:";          timeout 3600 python bench.py --batch 16
  echo "batch 32 plain:";    timeout 3600 python bench.py --batch 32
  echo "batch 32 mb16:";     timeout 3600 python bench.py --batch 32 --microbatch 16
  echo "--- onestep production chain ---"
  timeout 3600 python bench.py --mode onestep
  echo "=== done at $(date -u) ==="
} >> "$LOG" 2>&1
git add "$LOG" 2>/dev/null
git commit -q -m "round-5 bench validation: capture stability, batch-32 microbatch, onestep headline (log)" || true
echo "done -> $LOG"
