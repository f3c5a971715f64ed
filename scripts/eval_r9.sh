#!/bin/bash
# r9 flagship gate: does the de-quantizer finetuned against the round-4
# codec (scripts/run_r9.sh) beat THAT codec's own decode at 1.5 kbps?
# Same sweep + gate as eval_r8b.sh, with the condition codec and the
# comparison rows both pointed at stage1_codec_nodisc_r4 — i.e. the
# flagship claim re-proven against the STRONGER codec.
#
# Extra sweep points vs r8: onestep @t=100/@t=120.  The operating t is the
# noise level whose Gaussian magnitude matches the CODEC error; a better
# codec has smaller error, so the matched t moves down from r8's 160.
# The GATE still runs on the declared production row (onestep @t=160,
# ADVICE r4: never gate on the sweep best) and requires STOI no-regression.
#
# Usage:  bash scripts/eval_r9.sh
set -u
cd "$(dirname "$0")/.."

DIFF="${DIFF:-saved_models/stage3_diff_r9/model_best}"
CODEC="${CODEC:-saved_models/stage1_codec_nodisc_r4/model_best}"
LOG="${LOG:-logs/eval_r9.txt}"

SWEEP="onestep reencode 160
onestep reencode 120
onestep reencode 100
ddim_deq reencode 200
halfway cond 100" \
DIFF="$DIFF" CODEC="$CODEC" LOG="$LOG" bash scripts/eval_r8b.sh
