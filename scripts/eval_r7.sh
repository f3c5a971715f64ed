#!/bin/bash
# One-shot r7 stage-3 quality evaluation (fills BASELINE.md "Round-3
# stage-3 quality (r7)").  Run AFTER stopping the training runner — both
# jobs dispatch through the single axon tunnel and would thrash.
#
# Usage:  DIFF=saved_models/stage3_diff_r7/model_best bash scripts/eval_r7.sh
set -u
cd "$(dirname "$0")/.."

DIFF=${DIFF:-saved_models/stage3_diff_r7/model_best}
CODEC=${CODEC:-saved_models/stage1_codec_nodisc/model_best}
LOG=${LOG:-logs/eval_r7.txt}

{
  echo "=== eval_r7 at $(date -u) on $DIFF ==="
  # Checkpoint flavor (ADVICE r3 #4): f16-npz-restored weights differ from
  # the live orbax model_best by ~1e-3 relative; label which one these
  # numbers come from.
  case "$DIFF" in
    *model_import*) echo "checkpoint flavor: f16-npz import (not bit-identical to orbax model_best)" ;;
    *) echo "checkpoint flavor: live orbax ($DIFF)" ;;
  esac

  echo "--- diag_sampler3: re-encoded chain start, sdedit sweep ---"
  python scripts/diag_sampler3.py --diff "$DIFF" --codec "$CODEC" \
    --sdedit_ts 10 25 50 100 200 400

  echo "--- diag_sampler4: halfway midway_t sweep + direct cond_pred decode ---"
  python scripts/diag_sampler4.py --diff "$DIFF" --codec "$CODEC"

  echo "--- diag_sampler5: deterministic dequantization (one-step x0 + eta=0 ddim_from) ---"
  python scripts/diag_sampler5.py --diff "$DIFF" --codec "$CODEC"

  echo "--- eval_quality (1.2 s protocol = training length, 32 files) ---"
  for S in "halfway cond 100" "sdedit reencode 10" "sdedit reencode 25" \
           "sdedit reencode 50" "sdedit reencode 100" \
           "onestep reencode 160" "ddim_deq reencode 200"; do
    set -- $S
    python scripts/eval_quality.py --codec "$CODEC" \
      --ae saved_models/stage2_ae/model_best --diff "$DIFF" \
      --seconds 1.2 --n_files 32 --chain_dtype bfloat16 \
      --sampler "$1" --chain_start "$2" --midway_t "$3" \
      --ae_ratios 8 --upsampling_ratios 5 4 2 --time_decode
  done
} >> "$LOG" 2>&1

# Flagship pass/fail (VERDICT r3 item 6): the paper's claim is that the
# diffusion de-quantizer IMPROVES the discrete codec it decodes
# (arXiv 2311.08330; srcs/sample.py:130).  PASS iff some sampler config's
# mel distance beats the codec's own decode at the same bitrate.
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
