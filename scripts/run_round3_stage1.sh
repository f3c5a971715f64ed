#!/bin/bash
# Round-3 stage-1 experiments (VERDICT r2 items 2 and 4):
#
#   A. GAN branch:    +N epochs --use_disc finetune from the 28k-step nodisc
#                     codec (first REAL adversarial training run; the scanned
#                     GAN step makes it dispatch-affordable)
#   B. nodisc branch: +N epochs of the plain chain from the SAME start
#                     (continues the round-2 quality curve)
#
# Both branches share the same starting checkpoint and step count, giving the
# "codec @3 kbps, GAN vs nodisc at equal steps" comparison for BASELINE.md.
# Run from /root/repo:  bash scripts/run_round3_stage1.sh
set -e
cd "$(dirname "$0")/.."

EPOCHS_GAN=${EPOCHS_GAN:-400}
EPOCHS_NODISC=${EPOCHS_NODISC:-400}
START=${START:-saved_models/stage1_codec_nodisc/model_best}

echo "=== A. stage 1 GAN finetune (reference train.py:125-149 objective) ==="
timeout 7200 python -m ladiffcodec_tpu.train \
  --data_folder_path data_synth --seq_len_p_sec 1.0 \
  --enc_ratios 8 5 4 2 --quantization --bandwidth 3.0 --rvq_expire_threshold 0 \
  --model_type unet --use_disc --disc_freq 1 \
  --finetune_model "$START" \
  --batch_size 64 --lr 3e-4 --grad_clip 1.0 --steps_per_dispatch 5 \
  --exp_name stage1_codec_gan --steps "$EPOCHS_GAN"

echo "=== B. stage 1 nodisc continuation (same start, same steps) ==="
# NOTE: writes to a NEW exp dir — stage1_codec_nodisc/model_best is the
# frozen conditioning codec of the round-3 stage-3 run and must stay fixed
timeout 7200 python -m ladiffcodec_tpu.train \
  --data_folder_path data_synth --seq_len_p_sec 1.0 \
  --enc_ratios 8 5 4 2 --quantization --bandwidth 3.0 --rvq_expire_threshold 0 \
  --model_type unet \
  --finetune_model "$START" \
  --batch_size 64 --lr 6e-4 --mel_weight 3.0 --steps_per_dispatch 5 \
  --exp_name stage1_codec_nodisc_r3 --steps "$EPOCHS_NODISC"

echo "=== eval: GAN vs nodisc codec at equal total steps ==="
timeout 3600 python scripts/eval_quality.py \
  --codec saved_models/stage1_codec_gan/model_best \
  --data data_synth --n_files 32 --seconds 1.2
timeout 3600 python scripts/eval_quality.py \
  --codec saved_models/stage1_codec_nodisc_r3/model_best \
  --data data_synth --n_files 32 --seconds 1.2
