#!/bin/bash
# Chunked stage-1 nodisc continuation (VERDICT r2 item 4: keep the codec
# quality curve moving toward positive SI-SNR @3 kbps).
#
# Resumes the round-3 codec (saved_models/stage1_codec_nodisc_r3, -1.17 dB
# SI-SNR / 1.24 mel after ~37k steps) into a NEW exp dir — the _r3 dir is
# the round-3/r4 stage-3 run's frozen conditioning codec and must not move.
#
# Usage:  DEADLINE=$(date -d '+2 hours' +%s) bash scripts/run_stage1_chain.sh
set -u
cd "$(dirname "$0")/.."

EXP=${EXP:-stage1_codec_nodisc_r4}
CHUNK=${CHUNK:-1200}
DEADLINE=${DEADLINE:?unix-seconds deadline; no new chunk starts after this}
START=${START:-saved_models/stage1_codec_nodisc_r3/model_best}
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
  git add "$LOG" && git commit -q -m "stage-1 r4 training log checkpoint" || true
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    echo "chunk failed (rc=$rc), stopping" >> "$LOG"
    break
  fi
done
