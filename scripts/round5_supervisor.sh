#!/bin/bash
# Round-5 TPU phase supervisor: serializes every chip-bound phase of the
# round on the single axon tunnel (CLAUDE.md: never two TPU jobs at once).
#
#   1. wait for the stage-1 nodisc chain to finish (codec freeze)
#   2. r9 dequant finetune conditioned on the frozen round-4 codec
#   3. eval_r9 — the FLAGSHIP gate against that codec
#   4. tracked GAN codec branch (equal-steps vs the last nodisc chunk)
#   5. LM refresh on the shipping codec + .ecdc rows + one-command demo
#   6. GAN-vs-nodisc eval rows (mel + STOI, the perceptual-trade question)
#
# Usage: WAIT_PID=<nodisc chain pid> nohup bash scripts/round5_supervisor.sh &
set -u
cd "$(dirname "$0")/.."
LOG=logs/round5_supervisor.txt

note() { echo "=== $* at $(date -u) ===" >> "$LOG"; }

if [ -n "${WAIT_PID:-}" ]; then
  note "waiting for codec chain pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
note "codec frozen; starting r9"

DEADLINE=$(( $(date +%s) + 115*60 )) bash scripts/run_r9.sh >> "$LOG" 2>&1
note "r9 done; running eval_r9 flagship gate"

bash scripts/eval_r9.sh >> "$LOG" 2>&1
git add logs/eval_r9.txt logs/round5_supervisor.txt 2>/dev/null
git commit -q -m "eval_r9: flagship gate vs the round-4 continued codec (log)" || true
note "eval_r9 done; starting GAN branch"

DEADLINE=$(( $(date +%s) + 115*60 )) \
START=saved_models/stage1_codec_nodisc_r4/params_f16_chunk5start.npz \
  bash scripts/run_stage1_gan_r5.sh >> "$LOG" 2>&1
note "GAN done; starting LM refresh + demo"

bash scripts/run_lm_r5.sh >> "$LOG" 2>&1
git add logs/train_lm_r5.txt logs/round5_supervisor.txt 2>/dev/null
git commit -q -m "LM r5 refresh on the shipping codec: .ecdc rows + e2e demo (log)" || true
note "LM done; GAN-vs-nodisc eval rows"

{
  echo "=== gate-scope eval_gan_r5 (GAN branch) at $(date -u) ==="
  python scripts/eval_quality.py \
    --codec saved_models/stage1_codec_gan_r5/model_best \
    --data data_synth --n_files 32 --seconds 1.2
  echo "=== gate-scope eval_nodisc_final (equal-steps nodisc) at $(date -u) ==="
  python scripts/eval_quality.py \
    --codec saved_models/stage1_codec_nodisc_r4/model_best \
    --data data_synth --n_files 32 --seconds 1.2
} >> logs/eval_gan_r5.txt 2>&1
git add logs/eval_gan_r5.txt logs/round5_supervisor.txt 2>/dev/null
git commit -q -m "GAN vs nodisc codec eval at equal steps (mel + STOI rows)" || true
note "supervisor complete"
