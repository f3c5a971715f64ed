#!/bin/bash
# Round-5 TPU phase supervisor (v2, post-VM-restart): serializes every
# chip-bound phase of the round on the single axon tunnel (CLAUDE.md: never
# two TPU jobs at once).
#
# v1 never ran: the VM restarted before the codec chain finished, wiping all
# untracked orbax checkpoints AND .jax_cache.  v2 starts from the committed
# f16 npz snapshots (restored to orbax via scripts/ckpt_npz.py import) and
# time-boxes each phase against ROUND_END so the driver's end-of-round
# bench.py gets the chip back:
#
#   1. r9 dequant finetune conditioned on the frozen round-4 codec (1 chunk)
#   2. eval_r9 — the FLAGSHIP gate against that codec
#   3. tracked GAN codec branch (equal-steps vs the last nodisc chunk)
#   4. GAN-vs-nodisc eval rows (mel + STOI, the perceptual-trade question)
#   5. LM refresh on the shipping codec + .ecdc rows + one-command demo
#
# Usage: ROUND_END=<unix-s> nohup bash scripts/round5_supervisor.sh &
set -u
cd "$(dirname "$0")/.."
LOG=logs/round5_supervisor.txt
ROUND_END=${ROUND_END:?unix-seconds hard stop; leave ~15 min for driver bench}

note() { echo "=== $* at $(date -u) ($(( (ROUND_END - $(date +%s)) / 60 )) min to ROUND_END) ===" >> "$LOG"; }
left() { echo $(( ROUND_END - $(date +%s) )); }

note "supervisor v2 start; codec frozen at stage1_codec_nodisc_r4/params_f16.npz"

# --- 1. r9: one deq-finetune chunk (250 steps, ~51 min warm; cold compiles
# may eat into the 90-min timeout — the chunk still best-saves on the fly) ---
if [ "$(left)" -gt $(( 115 * 60 )) ]; then
  DEADLINE=$(( $(date +%s) + 300 )) bash scripts/run_r9.sh >> "$LOG" 2>&1
  note "r9 done"
else
  note "SKIP r9 (insufficient time)"
fi

# --- 2. flagship gate vs the round-4 codec ---
if [ -d saved_models/stage3_diff_r9/model_best ] || [ -d saved_models/stage3_diff_r9/model_latest ]; then
  note "running eval_r9 flagship gate"
  bash scripts/eval_r9.sh >> "$LOG" 2>&1
  git add logs/eval_r9.txt logs/round5_supervisor.txt 2>/dev/null
  git commit -q -m "eval_r9: flagship gate vs the round-4 continued codec (log)" || true
  note "eval_r9 done"
fi

# --- 3. tracked GAN codec branch.  Box the chunk so phases 4+5 (~35 min)
# still fit; below 20 usable minutes the run would be noise — skip. ---
GANBOX=$(( $(left) - 45 * 60 ))
[ "$GANBOX" -gt 5400 ] && GANBOX=5400
if [ "$GANBOX" -gt $(( 20 * 60 )) ]; then
  note "starting GAN branch (timeout ${GANBOX}s)"
  TRAIN_TIMEOUT=$GANBOX DEADLINE=$(( $(date +%s) + 300 )) \
  START=saved_models/stage1_codec_nodisc_r4/params_f16_chunk5start.npz \
    bash scripts/run_stage1_gan_r5.sh >> "$LOG" 2>&1
  note "GAN done"
else
  note "SKIP GAN (insufficient time)"
fi

# --- 4. GAN-vs-nodisc eval rows (mel + STOI) at equal steps ---
if [ -d saved_models/stage1_codec_gan_r5/model_best ] || [ -d saved_models/stage1_codec_gan_r5/model_latest ]; then
  GANCK=saved_models/stage1_codec_gan_r5/model_best
  [ -d "$GANCK" ] || GANCK=saved_models/stage1_codec_gan_r5/model_latest
  {
    echo "=== gate-scope eval_gan_r5 (GAN branch: $GANCK) at $(date -u) ==="
    python scripts/eval_quality.py \
      --codec "$GANCK" \
      --data data_synth --n_files 32 --seconds 1.2
    echo "=== gate-scope eval_nodisc_final (equal-steps nodisc r4) at $(date -u) ==="
    python scripts/eval_quality.py \
      --codec saved_models/stage1_codec_nodisc_r4/model_best \
      --data data_synth --n_files 32 --seconds 1.2
  } >> logs/eval_gan_r5.txt 2>&1
  git add logs/eval_gan_r5.txt logs/round5_supervisor.txt 2>/dev/null
  git commit -q -m "GAN vs nodisc codec eval at equal steps (mel + STOI rows)" || true
  note "GAN eval rows done"
fi

# --- 5. LM refresh on the shipping codec + .ecdc rows + e2e demo ---
if [ "$(left)" -gt $(( 18 * 60 )) ]; then
  bash scripts/run_lm_r5.sh >> "$LOG" 2>&1
  git add logs/train_lm_r5.txt logs/round5_supervisor.txt saved_models/lm_r5/params_f16.npz 2>/dev/null
  git commit -q -m "LM r5 refresh on the shipping codec: .ecdc rows + e2e demo (log)" || true
  note "LM done"
else
  note "SKIP LM (insufficient time)"
fi

note "supervisor complete"
git add "$LOG" 2>/dev/null; git commit -q -m "round-5 supervisor log" || true
