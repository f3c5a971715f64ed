#!/bin/bash
# Round-4 stage-3 dequantization finetune (r8).
#
# r7 closed the schedule/objective gaps (data_std SNR shift + pred_x0) and
# its deterministic dequantizers finally move codec latents TOWARD the data
# manifold (logs/diag_sampler5.txt) — but the margin over the codec's own
# decode is fractional.  Root cause targeted here: the samplers feed the
# denoiser x_t = sqrt(ab_t) * z_codec where the "noise" is the CODEC ERROR,
# while training only ever shows Gaussian noise.  r8 finetunes r7 with the
# --deq_weight aux loss (one extra model call per step at that exact
# operating point, L1 to the clean latent) + --deq_mel_weight (decode the
# dequant pred_x0 through the frozen decoder, multi-scale log-mel vs the
# input = the flagship gate metric).
#
# Usage:  DEADLINE=$(date -d '+3 hours' +%s) bash scripts/run_stage3_deq.sh
set -u
cd "$(dirname "$0")/.."

EXP=${EXP:-stage3_diff_r8}
# deq_mel's decoder fwd+bwd makes epochs ~2-4x the r7 cost; size chunks to
# end inside the timeout with a clean final best-save
CHUNK=${CHUNK:-250}
DEADLINE=${DEADLINE:?unix-seconds deadline; no new chunk starts after this}
START=${START:-saved_models/stage3_diff_r7/model_best}
LOG=logs/${EXP}.txt

if [ ! -d "saved_models/$EXP/model_latest" ] && [ ! -d "saved_models/$EXP/model_preempt" ] \
   && [ -f "saved_models/$EXP/params_f16.npz" ]; then
  echo "=== no orbax checkpoint; importing committed params_f16.npz ===" >> "$LOG"
  python scripts/ckpt_npz.py import "saved_models/$EXP/params_f16.npz" \
    "saved_models/$EXP/model_import" >> "$LOG" 2>&1 \
    && START="saved_models/$EXP/model_import"
fi

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  for cand in model_latest model_preempt; do
    d="saved_models/$EXP/$cand"
    if [ -d "$d" ] && { [ ! -d "${START:-/nonexistent}" ] || [ "$d" -nt "$START" ]; }; then
      START="$d"
    fi
  done
  echo "=== chunk from $START at $(date -u) ===" >> "$LOG"
  timeout "${TRAIN_TIMEOUT:-5400}" python -m ladiffcodec_tpu.train \
    --data_folder_path data_synth --seq_len_p_sec 1.2 --batch_size 32 \
    --lr 1e-4 --grad_clip 1.0 --write_on_every "${WRITE_EVERY:-50}" --steps_per_dispatch 5 \
    --model_type unet --run_diff --freeze_ed \
    --scaling_global --global_scale 1.3 --data_std 0.065 \
    --diff_objective pred_x0 \
    --rep_dims 128 --emb_dims 128 --diff_dims 128 --enc_ratios 8 \
    --unet_scale_cond --cond_pred_weight 0.5 \
    --deq_weight "${DEQW:-1.0}" --deq_mel_weight "${DEQMELW:-0.01}" \
    --deq_t_lo "${T_LO:-50}" --deq_t_hi "${T_HI:-300}" \
    --min_save_gain "${MIN_GAIN:-0.002}" \
    --model_for_cond "${COND:-saved_models/stage1_codec_nodisc}" \
    --cond_enc_ratios 8 5 4 2 --cond_quantization --cond_bandwidth 1.5 \
    --upsampling_ratios 5 4 2 \
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
    python scripts/ckpt_npz.py export "$snap" "saved_models/$EXP/params_f16.npz" \
      >> "$LOG" 2>&1 || true
    git add -f "saved_models/$EXP/params_f16.npz" "saved_models/$EXP/config.json" 2>/dev/null || true
  fi
  MSG="stage-3 $EXP dequant-finetune checkpoint (log + f16 params snapshot)"
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
