#!/bin/bash
# r8 flagship gate, rerun after the eval_quality objective bugfix: the
# script constructed the eval model with the DEFAULT diff_objective
# (pred_noise) while the r6+ checkpoints train pred_x0, so
# model_predictions misread the network output in every prior
# eval_quality diffusion row (logs/eval_r7.txt, logs/eval_r8.txt) —
# the per-file diag (logs/diag_perfile_r8.txt) runs the correct
# objective and shows onestep beating the codec on 32/32 files.
#
# Round-5 (ADVICE r4): the gate no longer regex-scans the whole append-mode
# log and no longer picks the sweep best — scripts/flagship_gate.py parses
# only rows after the `=== gate-scope` marker this run writes, and gates the
# DECLARED production row (onestep @t=160 reencode), with the sweep best
# reported separately.  STOI no-regression is part of the gate.
#
# Usage:  DIFF=saved_models/stage3_diff_r8/model_best bash scripts/eval_r8b.sh
set -u
cd "$(dirname "$0")/.."

DIFF=${DIFF:-saved_models/stage3_diff_r8/model_best}
CODEC=${CODEC:-saved_models/stage1_codec_nodisc/model_best}
LOG=${LOG:-logs/eval_r8b.txt}
SWEEP=${SWEEP:-"onestep reencode 160
onestep reencode 200
ddim_deq reencode 200
sdedit reencode 25
halfway cond 100"}

{
  echo "=== gate-scope eval_r8b at $(date -u) on $DIFF ==="
  case "$DIFF" in
    *model_import*) echo "checkpoint flavor: f16-npz import (not bit-identical to orbax model_best)" ;;
    *) echo "checkpoint flavor: live orbax ($DIFF)" ;;
  esac

  echo "$SWEEP" | while read -r S1 S2 S3; do
    [ -z "$S1" ] && continue
    python scripts/eval_quality.py --codec "$CODEC" \
      --ae saved_models/stage2_ae/model_best --diff "$DIFF" \
      --seconds 1.2 --n_files 32 --chain_dtype bfloat16 \
      --sampler "$S1" --chain_start "$S2" --midway_t "$S3" \
      --ae_ratios 8 --upsampling_ratios 5 4 2 --time_decode
  done
} >> "$LOG" 2>&1

python scripts/flagship_gate.py "$LOG" --prod "${PROD:-onestep-x0 @t=160, reencode start}"
echo "done -> $LOG"
