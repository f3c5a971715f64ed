#!/bin/bash
# Quality-evidence training chain (VERDICT r1 item 2): three LaDiffCodec
# stages at reduced scale on the v5e over the synthetic multi-speaker corpus,
# then the SI-SNR / mel-distance table (scripts/eval_quality.py).
# Run from /root/repo:  bash scripts/run_quality_stages.sh
set -e
cd "$(dirname "$0")/.."

EPOCHS1=${EPOCHS1:-600}
EPOCHS2=${EPOCHS2:-300}
EPOCHS3=${EPOCHS3:-400}

echo "=== stage 1: discrete codec (RVQ @3kbps, hop 320) ==="
timeout 7200 python -m ladiffcodec_tpu.train \
  --data_folder_path data_synth --seq_len_p_sec 1.0 \
  --enc_ratios 8 5 4 2 --quantization --bandwidth 3.0 --rvq_expire_threshold 0 --model_type unet \
  --batch_size 64 --lr 6e-4 --mel_weight 3.0 --exp_name stage1_codec_nodisc --steps "$EPOCHS1"

echo "=== stage 2: continuous AE (hop 8) ==="
timeout 7200 python -m ladiffcodec_tpu.train \
  --data_folder_path data_synth --seq_len_p_sec 1.2 \
  --enc_ratios 8 --model_type unet \
  --batch_size 32 --lr 1e-3 --mel_weight 3.0 --exp_name stage2_ae --steps "$EPOCHS2"

echo "=== stage 3: latent diffusion de-quantizer (cond @1.5 kbps) ==="
timeout 10800 python -m ladiffcodec_tpu.train \
  --data_folder_path data_synth --seq_len_p_sec 1.2 \
  --enc_ratios 8 --run_diff --freeze_ed --model_type unet \
  --scaling_global --unet_scale_cond \
  --finetune_model saved_models/stage2_ae/model_best \
  --model_for_cond saved_models/stage1_codec_nodisc \
  --cond_enc_ratios 8 5 4 2 --cond_quantization --cond_bandwidth 1.5 \
  --upsampling_ratios 5 4 2 \
  --batch_size 32 --lr 2e-4 --exp_name stage3_diff --steps "$EPOCHS3"

echo "=== eval: quality table ==="
timeout 3600 python scripts/eval_quality.py \
  --codec saved_models/stage1_codec_nodisc/model_best \
  --ae saved_models/stage2_ae/model_best \
  --diff saved_models/stage3_diff/model_best \
  --ae_ratios 8 --upsampling_ratios 5 4 2 \
  --data data_synth --n_files 32 --midway_t 100
