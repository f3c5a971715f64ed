#!/bin/bash
# Round-5 r9d — widen the flagship margin with DATA instead of steps or
# objective weight.
#
# r9c PASSED the flagship gate on all three metrics (logs/eval_r9.txt:
# production onestep-x0 @t=160 reencode — mel 0.946 vs codec 0.993, STOI
# 0.904 vs 0.881, SI-SNR 1.58 vs 1.11 dB) but its training log shows the
# mel-weighted objective overfitting the 64-min synthetic train set (train
# deq_mel falls 0.84->0.78 across the last chunks while val drifts up
# 0.88->0.91).  r9d keeps the r9c recipe EXACTLY (same objective weights,
# same production-t-centered deq range, same start point semantics) and
# triples the train corpus (scripts/expand_synth_corpus.sh; dev set
# byte-identical, so the gate protocol is unchanged).
#
# Gate afterwards on the SAME declared production row, appended to
# logs/eval_r9.txt.  model_best selection is on val, so a failed
# experiment cannot regress the shipped r9c weights — stage3_diff_r9d is
# a separate exp dir; BASELINE only switches if the gate row improves.
#
# Usage: DEADLINE=<unix-s> bash scripts/run_r9d.sh
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:?unix-seconds; no new chunk starts after this}

bash scripts/expand_synth_corpus.sh

EXP=stage3_diff_r9d \
START=saved_models/stage3_diff_r9c/model_best \
COND=saved_models/stage1_codec_nodisc_r4 \
DEQMELW=0.05 T_LO=100 T_HI=220 \
CHUNK=${CHUNK:-400} \
TRAIN_TIMEOUT=${TRAIN_TIMEOUT:-4200} \
DEADLINE=$DEADLINE \
  bash scripts/run_stage3_deq.sh

DIFF=saved_models/stage3_diff_r9d/model_best \
CODEC=saved_models/stage1_codec_nodisc_r4/model_best \
LOG=logs/eval_r9.txt \
SWEEP="onestep reencode 160" \
  bash scripts/eval_r8b.sh

git add logs/eval_r9.txt logs/stage3_diff_r9d.txt 2>/dev/null
git commit -q -m "eval_r9d: flagship gate after the tripled-corpus dequant finetune (log)" || true
echo "r9d done"
