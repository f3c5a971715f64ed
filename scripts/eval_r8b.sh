#!/bin/bash
# r8 flagship gate, rerun after the eval_quality objective bugfix: the
# script constructed the eval model with the DEFAULT diff_objective
# (pred_noise) while the r6+ checkpoints train pred_x0, so
# model_predictions misread the network output in every prior
# eval_quality diffusion row (logs/eval_r7.txt, logs/eval_r8.txt) —
# the per-file diag (logs/diag_perfile_r8.txt) runs the correct
# objective and shows onestep beating the codec on 32/32 files.
# diag_sampler5 results are already in logs/eval_r8.txt; this reruns
# only the 32-file eval_quality sweep + the gate.
#
# Usage:  DIFF=saved_models/stage3_diff_r8/model_best bash scripts/eval_r8b.sh
set -u
cd "$(dirname "$0")/.."

DIFF=${DIFF:-saved_models/stage3_diff_r8/model_best}
CODEC=${CODEC:-saved_models/stage1_codec_nodisc/model_best}
LOG=${LOG:-logs/eval_r8b.txt}

{
  echo "=== eval_r8b at $(date -u) on $DIFF (objective-fix rerun) ==="
  case "$DIFF" in
    *model_import*) echo "checkpoint flavor: f16-npz import (not bit-identical to orbax model_best)" ;;
    *) echo "checkpoint flavor: live orbax ($DIFF)" ;;
  esac

  for S in "onestep reencode 160" "onestep reencode 200" \
           "ddim_deq reencode 200" "sdedit reencode 25" "halfway cond 100"; do
    set -- $S
    python scripts/eval_quality.py --codec "$CODEC" \
      --ae saved_models/stage2_ae/model_best --diff "$DIFF" \
      --seconds 1.2 --n_files 32 --chain_dtype bfloat16 \
      --sampler "$1" --chain_start "$2" --midway_t "$3" \
      --ae_ratios 8 --upsampling_ratios 5 4 2 --time_decode
  done
} >> "$LOG" 2>&1

python - "$LOG" <<'EOF'
import re, sys
codec, diff = None, []
for line in open(sys.argv[1]):
    m = re.match(r"codec @1\.5 kbps\s+(-?[\d.]+)\s+([\d.]+)", line)
    if m:
        codec = (float(m.group(1)), float(m.group(2)))
    m = re.match(r"diffusion de-qtz @1\.5 kbps \((.+?)\)\s+(-?[\d.]+)\s+([\d.]+)", line)
    if m:
        diff.append((m.group(1), float(m.group(2)), float(m.group(3))))
if codec is None or not diff:
    print("FLAGSHIP: INCOMPLETE (missing codec or diffusion rows in log)")
    sys.exit(0)
best = min(diff, key=lambda r: r[2])
verdict = "PASS" if best[2] < codec[1] else "FAIL"
print(f"FLAGSHIP {verdict}: best diffusion mel {best[2]:.3f} ({best[0]}) "
      f"vs codec @1.5 mel {codec[1]:.3f} "
      f"(SI-SNR {best[1]:.2f} vs {codec[0]:.2f} dB)")
EOF
echo "done -> $LOG"
