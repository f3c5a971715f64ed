#!/bin/bash
# One-shot quality eval for the round-4 stage-1 codec continuation
# (VERDICT r3 item 4): did the chunked chain beat the surviving round-2
# codec (stage1_codec_nodisc, -2.96 dB SI-SNR / 1.94 mel @3 kbps) and
# approach the wiped round-3 continuation (-1.17 dB / 1.24 mel)?
#
# Usage:  bash scripts/eval_codec_r4.sh
#         CODEC=saved_models/stage1_codec_nodisc_r4/model_import bash ...
set -u
cd "$(dirname "$0")/.."

EXP=${EXP:-stage1_codec_nodisc_r4}
CODEC=${CODEC:-saved_models/$EXP/model_best}
LOG=${LOG:-logs/eval_codec_r4.txt}

if [ ! -d "$CODEC" ] && [ -f "saved_models/$EXP/params_f16.npz" ]; then
  echo "importing committed npz (orbax dir absent)" >> "$LOG"
  python scripts/ckpt_npz.py import "saved_models/$EXP/params_f16.npz" \
    "saved_models/$EXP/model_import" >> "$LOG" 2>&1
  CODEC="saved_models/$EXP/model_import"
fi

{
  echo "=== eval_codec_r4 at $(date -u) on $CODEC ==="
  case "$CODEC" in
    *model_import*) echo "checkpoint flavor: f16-npz import (not bit-identical to orbax model_best)" ;;
    *) echo "checkpoint flavor: live orbax ($CODEC)" ;;
  esac
  python scripts/eval_quality.py --codec "$CODEC" \
    --seconds 1.2 --n_files 32
} >> "$LOG" 2>&1

python - "$LOG" <<'EOF'
import re, sys
rows = {}
for line in open(sys.argv[1]):
    m = re.match(r"codec @([\d.]+) kbps\s+(-?[\d.]+)\s+([\d.]+)", line)
    if m:
        rows[m.group(1)] = (float(m.group(2)), float(m.group(3)))  # last wins
if "3.0" not in rows:
    print("CODEC-R4: INCOMPLETE (no codec @3.0 row in log)")
    sys.exit(0)
sisnr, mel = rows["3.0"]
# round-2 surviving codec @3.0: -2.96 dB / 1.94 mel (BASELINE.md)
verdict = "PASS" if sisnr > -2.96 and mel < 1.94 else "FAIL"
extra = f"; @1.5: {rows['1.5'][0]:.2f} dB / {rows['1.5'][1]:.3f}" if "1.5" in rows else ""
print(f"CODEC-R4 {verdict}: @3.0 kbps SI-SNR {sisnr:.2f} dB / mel {mel:.3f} "
      f"vs round-2 codec -2.96 / 1.940 (wiped r3 target: -1.17 / 1.240){extra}")
EOF
echo "done -> $LOG"
