#!/bin/bash
# r9 flagship gate: does the de-quantizer finetuned against the round-4
# codec (scripts/run_r9.sh) beat THAT codec's own decode at 1.5 kbps?
# Same sweep + gate as eval_r8b.sh, with the condition codec and the
# comparison rows both pointed at stage1_codec_nodisc_r4 — i.e. the
# flagship claim re-proven against the STRONGER codec.
#
# One extra sweep point vs r8: onestep @t=100.  The operating t is the
# noise level whose Gaussian magnitude matches the CODEC error; a better
# codec has smaller error, so the matched t moves down from r8's 160.
#
# Usage:  bash scripts/eval_r9.sh
set -u
cd "$(dirname "$0")/.."

DIFF="${DIFF:-saved_models/stage3_diff_r9/model_best}"
CODEC="${CODEC:-saved_models/stage1_codec_nodisc_r4/model_best}"
LOG="${LOG:-logs/eval_r9.txt}"

{
  echo "=== eval_r9 extra sweep point (onestep @t=100) at $(date -u) ==="
  python scripts/eval_quality.py --codec "$CODEC" \
    --ae saved_models/stage2_ae/model_best --diff "$DIFF" \
    --seconds 1.2 --n_files 32 --chain_dtype bfloat16 \
    --sampler onestep --chain_start reencode --midway_t 100 \
    --ae_ratios 8 --upsampling_ratios 5 4 2 --time_decode
} >> "$LOG" 2>&1

DIFF="$DIFF" CODEC="$CODEC" LOG="$LOG" bash scripts/eval_r8b.sh
