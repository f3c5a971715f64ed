#!/bin/bash
# Round-5 r9 continuation — the flagship-gate retry.
#
# eval_r9 (logs/eval_r9.txt) FAILED on mel ONLY: production onestep-x0
# @t=160 scored mel 0.999 vs the r4 codec's own 0.993, while WINNING the
# perceptual metric (STOI 0.897 vs 0.881) and SI-SNR (1.82 vs 1.11 dB).
# The single 250-step r9 chunk's val deq_mel was still falling at its
# budget (0.9513 -> 0.9240, logs/stage3_diff_r9.txt), so the honest lever
# is the same recipe with more steps — NOT reweighting the loss or
# re-picking the production row (ADVICE r4: never gate on the sweep best).
#
# Continues the dequant finetune from stage3_diff_r9's newest checkpoint in
# DEADLINE-bounded chunks (run_stage3_deq.sh picks up model_latest), then
# re-runs the gate on the production row only.  flagship_gate.py parses
# rows after the LAST `=== gate-scope` marker, so the appended re-eval
# supersedes the earlier sweep cleanly.
#
# Usage: DEADLINE=<unix-s; no new chunk starts after> bash scripts/run_r9b.sh
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:?unix-seconds; no new chunk starts after this}

EXP=stage3_diff_r9 \
START=saved_models/stage3_diff_r9/model_best \
COND=saved_models/stage1_codec_nodisc_r4 \
CHUNK=${CHUNK:-750} \
TRAIN_TIMEOUT=${TRAIN_TIMEOUT:-1500} \
DEADLINE=$DEADLINE \
  bash scripts/run_stage3_deq.sh

DIFF=saved_models/stage3_diff_r9/model_best \
CODEC=saved_models/stage1_codec_nodisc_r4/model_best \
LOG=logs/eval_r9.txt \
SWEEP="onestep reencode 160" \
  bash scripts/eval_r8b.sh

git add logs/eval_r9.txt logs/stage3_diff_r9.txt 2>/dev/null
git commit -q -m "eval_r9 retry: flagship gate after the r9 dequant continuation (log)" || true
echo "r9b done"
