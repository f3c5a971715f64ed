#!/bin/bash
# Round-4 r9: dequantization finetune conditioned on the ROUND-4 continued
# codec (stage1_codec_nodisc_r4, produced by scripts/run_stage1_chain.sh).
#
# The r8 flagship result (BASELINE.md round-4 section: FLAGSHIP PASS) is
# conditioned on the surviving round-2 codec.  The round-4 stage-1 chain
# yields a better condition codec, which both feeds the de-quantizer a
# cleaner latent AND raises the bar it must beat (the codec's own decode at
# equal bitrate).  r9 = r8 weights, same deq operating-point aux losses
# (scripts/run_stage3_deq.sh), cond swapped to the r4 codec so the denoiser
# adapts to the new codec-error distribution.
#
# Gate afterwards: bash scripts/eval_r9.sh  (PASS = diffusion beats the r4
# codec's own 1.5 kbps decode on mel distance).
#
# Usage:  DEADLINE=$(date -d '+2 hours' +%s) bash scripts/run_r9.sh
set -u
cd "$(dirname "$0")/.."

EXP=stage3_diff_r9 \
START="${START:-saved_models/stage3_diff_r8/model_best}" \
COND=saved_models/stage1_codec_nodisc_r4 \
DEADLINE="${DEADLINE:?unix-seconds deadline}" \
  bash scripts/run_stage3_deq.sh
