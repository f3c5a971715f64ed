#!/bin/bash
# Round-5 LM refresh onto the SHIPPING codec (VERDICT r4 item 4): retrain the
# entropy-coding LM on the round-4/5 continued codec's code streams and
# re-measure the .ecdc rows, so `python -m ladiffcodec_tpu.bitstream --lm`
# numbers reproduce from a fresh clone against the CURRENT codec, not the
# round-2 one.  Ref: /root/reference/srcs/encodec/compress.py:72-85.
#
# Saves dev-best to saved_models/lm_r5 (+ f16 npz, git-added), then reruns
# the wav -> .ecdc -> wav benchmark AND the one-command production demo.
#
# Run with the TPU otherwise idle.  Usage: bash scripts/run_lm_r5.sh
set -u
cd "$(dirname "$0")/.."
CODEC=${CODEC:-saved_models/stage1_codec_nodisc_r4/model_best}
DIFF=${DIFF:-saved_models/stage3_diff_r9/model_best}
OUT=${OUT:-saved_models/lm_r5}
LOG=logs/train_lm_r5.txt

{
  echo "=== run_lm_r5 at $(date -u) codec=$CODEC ==="
  timeout 5400 python scripts/train_lm.py \
    --codec "$CODEC" \
    --out "$OUT" --steps 3000 --n_utts 960 --passes 2
  echo "--- f16 npz snapshot ---"
  python scripts/ckpt_npz.py export "$OUT/model_best" "$OUT/params_f16.npz"
  git add -f "$OUT/params_f16.npz" 2>/dev/null || true
  echo "--- bench_lm_compress (codec=$CODEC, lm=dev-best r5) ---"
  timeout 3600 python scripts/bench_lm_compress.py \
    --codec "$CODEC" --lm "$OUT/model_best"
  echo "--- demo_e2e: wav -> .ecdc(LM) -> dequant decode -> wav ---"
  timeout 3600 python scripts/demo_e2e.py \
    --codec "$CODEC" --diff "$DIFF" --lm "$OUT/model_best" \
    --out outputs/demo_r5/
} >> "$LOG" 2>&1
echo "done -> $LOG"
