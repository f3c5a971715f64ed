#!/bin/bash
# Round-3 stage-3 long retrain (VERDICT r2 item 1).
#
# The round-2 diffusion row was mistrained under global_scale=18 (the
# reference's hardcoded divisor, srcs/model.py:166) and the retrained 33k-step
# v3 checkpoint was lost to a VM restart (only its config.json was committed).
# This run retrains from the frozen stage-2 AE with:
#   - --global_scale 1.3 (measured stage-2 latent max-abs ~1.26)
#   - --cond_pred_weight 0.5: aux L1 tying process_cond(cond) to the scaled
#     target latent, so the reference production halfway chain
#     (srcs/sample.py:125-131) starts on-distribution (round-3 diagnosis
#     measured the unconstrained upsampler start at -56 dB from the target)
#   - fixed-key model selection, decoder readout skipped in the train step
#
# Chunked: each CHUNK-epoch segment resumes from model_latest with full
# TrainState (opt state included), so a VM restart costs at most one chunk.
# The caller commits logs (and periodically the checkpoint) between chunks.
#
# Usage:  DEADLINE=$(date -d '+7 hours' +%s) bash scripts/run_round3_stage3.sh
set -u
cd "$(dirname "$0")/.."

EXP=${EXP:-stage3_diff_r3}
CHUNK=${CHUNK:-600}
DEADLINE=${DEADLINE:?unix-seconds deadline; no new chunk starts after this}
START=${START:-saved_models/stage2_ae/model_best}
LOG=logs/${EXP}.txt

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if [ -d "saved_models/$EXP/model_latest" ]; then
    START="saved_models/$EXP/model_latest"
  fi
  echo "=== chunk from $START at $(date -u) ===" >> "$LOG"
  timeout 5400 python -m ladiffcodec_tpu.train \
    --data_folder_path data_synth --seq_len_p_sec 1.2 --batch_size 32 \
    --lr 1e-4 --grad_clip 1.0 --write_on_every 10 --steps_per_dispatch 5 \
    --model_type unet --run_diff --freeze_ed \
    --scaling_global --global_scale 1.3 \
    --rep_dims 128 --emb_dims 128 --diff_dims 128 --enc_ratios 8 \
    --unet_scale_cond --cond_pred_weight 0.5 \
    --model_for_cond "${COND:-saved_models/stage1_codec_nodisc_r3}" \
    --cond_enc_ratios 8 5 4 2 --cond_quantization --cond_bandwidth 1.5 \
    --upsampling_ratios 5 4 2 \
    --finetune_model "$START" \
    --exp_name "$EXP" --steps "$CHUNK" >> "$LOG" 2>&1
  rc=$?
  echo "=== chunk exit $rc at $(date -u) ===" >> "$LOG"
  git add "$LOG" && git commit -q -m "stage-3 r3 training log checkpoint" || true
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    echo "chunk failed (rc=$rc), stopping" >> "$LOG"
    break
  fi
done
