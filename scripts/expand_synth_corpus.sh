#!/bin/bash
# Round-5 r9d prep: 5x the synthetic TRAIN corpus.
#
# Why: the r9c mel-weighted dequant finetune converged with a persistent
# val/train gap (train deq_mel ~0.78 vs val ~0.89, logs/stage3_diff_r9c.txt
# last chunks — train keeps falling while val drifts up), i.e. the
# operating-point objective is OVERFITTING the ~64 min synthetic train set,
# not underfitting the task.  More steps is a dead lever (measured, r9b);
# more speakers/utterances is the live one.
#
# dev-clean is left BYTE-IDENTICAL (same files, same seed-0 speakers) so
# every val baseline and the 32-file flagship-gate protocol stay comparable
# across r9/r9b/r9c/r9d.  New speakers are generated with an independent
# seed into a side tree and merged under speaker ids 1000+ (the loader
# globs train-clean-100/*/*/*.wav, first 10k files — 960 + 3840 stays
# under the cap; generation is ~1.7 s/speaker on this host).
#
# Usage: bash scripts/expand_synth_corpus.sh   (idempotent)
set -eu
cd "$(dirname "$0")/.."

if ls data_synth/train-clean-100/1000 >/dev/null 2>&1; then
  echo "extra speakers already merged; nothing to do"
  exit 0
fi

python scripts/make_synth_speech.py --out data_synth_extra \
  --train_speakers 240 --dev_speakers 0 --utt_per_speaker 16 --seed 7

for d in data_synth_extra/train-clean-100/*/; do
  s=$(basename "$d")
  mv "$d" "data_synth/train-clean-100/$((1000 + s))"
done
rm -rf data_synth_extra  # the side dev split is never used

echo "train files now: $(find data_synth/train-clean-100 -name '*.wav' | wc -l)"
echo "dev files unchanged: $(find data_synth/dev-clean -name '*.wav' | wc -l)"
