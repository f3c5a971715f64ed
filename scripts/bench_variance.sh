#!/bin/bash
# Bench headline reconciliation (VERDICT r3 weak #1 / next-round item 2).
#
# BENCH_r03.json recorded 114.38x while BASELINE.md claimed 120.9x — far
# outside the assumed ±1 RTF noise.  This runs bench.py N times per chain
# dtype, prints every RTF plus the median±spread, so BASELINE.md can record
# the median and bench.py's default can be set to whichever dtype is
# actually fastest in this environment.
#
# Run with the TPU otherwise idle (training runner stopped) — both jobs
# dispatch through the single axon tunnel.
#
# Usage: bash scripts/bench_variance.sh [N]   (default N=5)
set -u
cd "$(dirname "$0")/.."
N=${1:-5}
LOG=${LOG:-logs/bench_variance.txt}

{
  echo "=== bench_variance N=$N at $(date -u) ==="
  for DT in bfloat16 float32; do
    echo "--- chain_dtype $DT ---"
    for i in $(seq 1 "$N"); do
      OUT=$(timeout 2400 python bench.py --chain_dtype "$DT" 2>/dev/null | tail -1)
      echo "run $i: $OUT"
    done
  done
} >> "$LOG" 2>&1

python - "$LOG" <<'EOF'
import json, re, sys, statistics
runs = {"bfloat16": [], "float32": []}
dt = None
for line in open(sys.argv[1]):
    m = re.match(r"--- chain_dtype (\w+) ---", line)
    if m: dt = m.group(1)
    m = re.match(r"run \d+: (\{.*\})", line)
    if m and dt:
        runs[dt].append(json.loads(m.group(1))["value"])
for dt, vals in runs.items():
    if vals:
        print(f"{dt}: n={len(vals)} median={statistics.median(vals):.1f} "
              f"min={min(vals):.1f} max={max(vals):.1f} "
              f"spread={max(vals)-min(vals):.1f}  all={[round(v,1) for v in vals]}")
EOF
