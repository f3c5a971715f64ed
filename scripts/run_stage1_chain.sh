#!/bin/bash
# Chunked stage-1 nodisc continuation (VERDICT r2 item 4: keep the codec
# quality curve moving toward positive SI-SNR @3 kbps).
#
# HISTORY: the round-3 continuation (stage1_codec_nodisc_r3, -1.17 dB
# SI-SNR / 1.24 mel after ~37k steps — BASELINE.md) was WIPED by the VM
# restart along with every untracked checkpoint; its results survive in
# logs/stage1_codec_nodisc_r3.txt.  Chains now resume from the surviving
# round-2 codec (stage1_codec_nodisc, git-tracked).  Export + commit an f16
# npz between chunks like run_round3_stage3.sh if you restart this.
#
# Usage:  DEADLINE=$(date -d '+2 hours' +%s) bash scripts/run_stage1_chain.sh
set -u
cd "$(dirname "$0")/.."

EXP=${EXP:-stage1_codec_nodisc_r4}
CHUNK=${CHUNK:-1200}
DEADLINE=${DEADLINE:?unix-seconds deadline; no new chunk starts after this}
START=${START:-saved_models/stage1_codec_nodisc/model_best}
LOG=logs/${EXP}.txt

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if [ -d "saved_models/$EXP/model_latest" ]; then
    START="saved_models/$EXP/model_latest"
  fi
  echo "=== chunk from $START at $(date -u) ===" >> "$LOG"
  timeout 5400 python -m ladiffcodec_tpu.train \
    --data_folder_path data_synth --seq_len_p_sec 1.0 \
    --enc_ratios 8 5 4 2 --quantization --bandwidth 3.0 \
    --rvq_expire_threshold 0 \
    --model_type unet \
    --batch_size 64 --lr 6e-4 --mel_weight 3.0 --steps_per_dispatch 5 \
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
  # Rolling snapshot commit (ADVICE r3 #1): amend the previous chunk's
  # snapshot commit instead of adding a full npz blob per chunk.
  MSG="stage-1 $EXP training checkpoint (log + f16 params snapshot)"
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
