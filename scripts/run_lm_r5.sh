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
# Deadline-aware: when ROUND_END is set (the supervisor exports it), every
# stage's timeout is derived from the time left minus a reserve for the
# driver's end-of-round bench.py, and optional tails (bench, demo) are
# skipped outright when they no longer fit.  train_lm.py only saves at the
# END (scripts/train_lm.py:135) — a timeout kill there loses the phase, so
# the train stage gets whatever budget remains rather than a fixed 5400.
#
# Run with the TPU otherwise idle.  Usage: bash scripts/run_lm_r5.sh
set -u
cd "$(dirname "$0")/.."
CODEC=${CODEC:-saved_models/stage1_codec_nodisc_r4/model_best}
DIFF=${DIFF:-saved_models/stage3_diff_r9/model_best}
OUT=${OUT:-saved_models/lm_r5}
LOG=logs/train_lm_r5.txt

RESERVE=${RESERVE_S:-720}  # seconds kept free before ROUND_END for the driver bench
left() {
  if [ -n "${ROUND_END:-}" ]; then
    echo $(( ROUND_END - $(date +%s) - RESERVE ))
  else
    echo 7200
  fi
}
cap() { local t=$1 max=$2; [ "$t" -gt "$max" ] && t=$max; echo "$t"; }

L=$(left)
if [ "$L" -lt 420 ]; then
  echo "=== run_lm_r5 SKIPPED at $(date -u): only ${L}s left before reserve ===" >> "$LOG"
  echo "skipped (insufficient time) -> $LOG"
  exit 0
fi

# corpus build dominates the train stage (~7 min at 960 utts on this 1-core
# host); under a tight budget shrink the corpus so the end-save still happens
N_UTTS=960; PASSES=2; STEPS=3000
if [ "$L" -lt 1200 ]; then N_UTTS=480; PASSES=1; STEPS=1500; fi

{
  echo "=== run_lm_r5 at $(date -u) codec=$CODEC (budget ${L}s, n_utts $N_UTTS) ==="
  timeout "$(cap "$L" 5400)" python scripts/train_lm.py \
    --codec "$CODEC" \
    --out "$OUT" --steps "$STEPS" --n_utts "$N_UTTS" --passes "$PASSES"
  echo "--- f16 npz snapshot ---"
  python scripts/ckpt_npz.py export "$OUT/model_best" "$OUT/params_f16.npz"
  git add -f "$OUT/params_f16.npz" 2>/dev/null || true
  L=$(left)
  if [ "$L" -gt 300 ]; then
    echo "--- bench_lm_compress (codec=$CODEC, lm=dev-best r5; budget ${L}s) ---"
    timeout "$(cap "$L" 3600)" python scripts/bench_lm_compress.py \
      --codec "$CODEC" --lm "$OUT/model_best"
  else
    echo "--- bench_lm_compress SKIPPED (${L}s left) ---"
  fi
  L=$(left)
  if [ "$L" -gt 240 ]; then
    echo "--- demo_e2e: wav -> .ecdc(LM) -> dequant decode -> wav (budget ${L}s) ---"
    timeout "$(cap "$L" 3600)" python scripts/demo_e2e.py \
      --codec "$CODEC" --diff "$DIFF" --lm "$OUT/model_best" \
      --out outputs/demo_r5/
  else
    echo "--- demo_e2e SKIPPED (${L}s left) ---"
  fi
} >> "$LOG" 2>&1
echo "done -> $LOG"
