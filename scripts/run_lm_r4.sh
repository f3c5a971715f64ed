#!/bin/bash
# Round-4 LM retrain + durable snapshot + end-to-end compression rows
# (VERDICT r3 item 3: the dev-selected 6.87-bits/code LM behind the
# BASELINE.md LM rows was wiped; saved_models/lm still held the round-2
# overfit model).
#
# Trains on the SURVIVING git-tracked round-2 codec
# (stage1_codec_nodisc) so a fresh clone reproduces codec + LM + the
# bench_lm_compress rows with no other artifacts.  Saves dev-best to
# saved_models/lm (orbax, git-tracked — ~18 MB, same as round 2) plus an
# f16 npz, then reruns the wav->.ecdc->wav benchmark.
#
# Run with the TPU otherwise idle.  Usage: bash scripts/run_lm_r4.sh
set -u
cd "$(dirname "$0")/.."
LOG=logs/train_lm_r4.txt

{
  echo "=== run_lm_r4 at $(date -u) ==="
  timeout 5400 python scripts/train_lm.py \
    --codec saved_models/stage1_codec_nodisc/model_best \
    --out saved_models/lm --steps 3000 --n_utts 960 --passes 2
  echo "--- f16 npz snapshot ---"
  python scripts/ckpt_npz.py export saved_models/lm/model_best \
    saved_models/lm/params_f16.npz
  echo "--- bench_lm_compress (codec=stage1_codec_nodisc, lm=dev-best r4) ---"
  timeout 3600 python scripts/bench_lm_compress.py \
    --codec saved_models/stage1_codec_nodisc/model_best \
    --lm saved_models/lm/model_best
} >> "$LOG" 2>&1
echo "done -> $LOG"
