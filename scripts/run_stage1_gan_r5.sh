#!/bin/bash
# Round-5 tracked GAN codec (VERDICT r4 item 3): --use_disc stage-1 finetune
# resumed from the ROUND-4 continued codec, chunked with f16 snapshot commits
# so the weights survive (the round-3 GAN run was wiped; its numbers live
# only in logs/vr3_gan.txt).  Objective = the reference's adversarial stage-1
# (srcs/train.py:125-149: hinge disc + feature-matching + mel).
#
# Equal-steps comparison for BASELINE.md: start this from the SAME snapshot
# the last nodisc chunk started from (pass START=) and run the same CHUNK
# step count; both branches restart the optimizer (finetune_model semantics),
# so "GAN vs nodisc at equal steps from the same start" is symmetric.
#
# Usage:  DEADLINE=$(date -d '+2 hours' +%s) START=... bash scripts/run_stage1_gan_r5.sh
set -u
cd "$(dirname "$0")/.."

EXP=${EXP:-stage1_codec_gan_r5}
CHUNK=${CHUNK:-1200}
DEADLINE=${DEADLINE:?unix-seconds deadline; no new chunk starts after this}
START=${START:-saved_models/stage1_codec_nodisc_r4/model_best}
LOG=logs/${EXP}.txt

if [ ! -d "$START" ] && [ -f "$START" ]; then
  # START may be an f16 npz snapshot (frozen chunk boundary)
  python scripts/ckpt_npz.py import "$START" "saved_models/$EXP/model_start" >> "$LOG" 2>&1
  START="saved_models/$EXP/model_start"
fi

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if [ -d "saved_models/$EXP/model_latest" ]; then
    START="saved_models/$EXP/model_latest"
  fi
  echo "=== chunk from $START at $(date -u) ===" >> "$LOG"
  timeout "${TRAIN_TIMEOUT:-5400}" python -m ladiffcodec_tpu.train \
    --data_folder_path data_synth --seq_len_p_sec 1.0 \
    --enc_ratios 8 5 4 2 --quantization --bandwidth 3.0 \
    --rvq_expire_threshold 0 \
    --model_type unet --use_disc --disc_freq 1 \
    --batch_size 64 --lr 3e-4 --grad_clip 1.0 --steps_per_dispatch 5 \
    --write_on_every 50 \
    --finetune_model "$START" \
    --exp_name "$EXP" --steps "$CHUNK" >> "$LOG" 2>&1
  rc=$?
  echo "=== chunk exit $rc at $(date -u) ===" >> "$LOG"
  snap=""
  for cand in model_best model_latest model_preempt; do
    d="saved_models/$EXP/$cand"
    [ -d "$d" ] && { [ -z "$snap" ] || [ "$d" -nt "$snap" ]; } && snap="$d"
  done
  if [ -n "$snap" ]; then
    python scripts/ckpt_npz.py export "$snap" "saved_models/$EXP/params_f16.npz" >> "$LOG" 2>&1 || true
    git add -f "saved_models/$EXP/params_f16.npz" "saved_models/$EXP/config.json" 2>/dev/null || true
  fi
  MSG="stage-1 $EXP GAN training checkpoint (log + f16 params snapshot)"
  git add "$LOG"
  if [ "$(git log -1 --pretty=%s)" = "$MSG" ]; then
    git commit -q --amend -m "$MSG" || true
  else
    git commit -q -m "$MSG" || true
  fi
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    echo "chunk failed (rc=$rc), stopping" >> "$LOG"
    break
  fi
done
