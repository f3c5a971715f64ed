#!/bin/bash
# r9 flagship gate: does the de-quantizer finetuned against the round-4
# codec (scripts/run_r9.sh) beat THAT codec's own decode at 1.5 kbps?
# Same sweep + gate as eval_r8b.sh, with the condition codec and the
# comparison rows both pointed at stage1_codec_nodisc_r4 — i.e. the
# flagship claim re-proven against the STRONGER codec.
#
# Usage:  bash scripts/eval_r9.sh
set -u
cd "$(dirname "$0")/.."

DIFF="${DIFF:-saved_models/stage3_diff_r9/model_best}" \
CODEC="${CODEC:-saved_models/stage1_codec_nodisc_r4/model_best}" \
LOG="${LOG:-logs/eval_r9.txt}" \
  bash scripts/eval_r8b.sh
