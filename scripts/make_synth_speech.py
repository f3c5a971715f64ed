"""Generate a multi-speaker synthetic speech-like corpus in LibriSpeech layout.

LibriSpeech is not present in this container, so quality-evidence training
runs use formant-synthesized pseudo-speech: per-speaker pitch ranges and
vocal-tract scaling, utterances built from random phoneme-like segments —
voiced vowels (glottal-ish pulse train through a cascade of formant
resonators), nasals, fricatives (shaped noise), stops (closure + burst) and
pauses, with pitch contours, jitter, and amplitude envelopes.  The result
has the coarse spectro-temporal structure of speech (harmonics, formant
movement, voiced/unvoiced alternation) that the codec, RVQ and diffusion
stages must actually model to reconstruct.

Layout (matches data/librispeech.py globs):
  {out}/train-clean-100/{spk}/{chap}/{spk}-{chap}-{utt}.wav
  {out}/dev-clean/{spk}/{chap}/{spk}-{chap}-{utt}.wav
"""

import argparse
import os
import sys

import numpy as np
from scipy.signal import lfilter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ladiffcodec_tpu.data.audio_io import write_wav  # noqa: E402

SR = 16000

# vowel formant templates (F1, F2, F3) in Hz, adult-neutral
VOWELS = {
    "a": (730, 1090, 2440),
    "e": (530, 1840, 2480),
    "i": (270, 2290, 3010),
    "o": (570, 840, 2410),
    "u": (300, 870, 2240),
}
FRIC_BANDS = {  # fricative noise shaping: (center, bandwidth)
    "s": (5000, 2000),
    "sh": (3000, 1500),
    "f": (4500, 3500),
}


def resonator(x, freq, bw, sr=SR):
    """2nd-order all-pole resonator (digital formant filter)."""
    r = np.exp(-np.pi * bw / sr)
    w = 2 * np.pi * freq / sr
    a = [1.0, -2 * r * np.cos(w), r * r]
    b = [1 - r]
    return lfilter(b, a, x)


def glottal_source(n, f0_contour, rng):
    """Impulse-train-ish glottal source with jitter and a -12dB/oct tilt."""
    phase = np.cumsum(f0_contour / SR)
    jitter = 1.0 + 0.01 * rng.standard_normal(n)
    saw = 2 * ((phase * jitter) % 1.0) - 1.0  # sawtooth = rich harmonics
    # one-pole lowpass for spectral tilt
    return lfilter([0.3], [1.0, -0.7], saw)


def vowel_segment(n, f0_contour, formants, scale, rng):
    src = glottal_source(n, f0_contour, rng)
    y = np.zeros(n)
    for i, f in enumerate(formants):
        bw = 60 + 40 * i
        y += resonator(src, f * scale, bw) / (i + 1)
    # pre-emphasis: undo part of the source tilt so formants carry energy
    return lfilter([1.0, -0.9], [1.0], y)


def fricative_segment(n, band, rng):
    noise = rng.standard_normal(n)
    c, bw = band
    return resonator(noise, c, bw) * 0.15


def nasal_segment(n, f0_contour, scale, rng):
    src = glottal_source(n, f0_contour, rng)
    y = resonator(src, 250 * scale, 80) + 0.3 * resonator(src, 2200 * scale, 200)
    return y * 0.6


def stop_segment(n, rng):
    y = np.zeros(n)
    burst_at = int(n * 0.7)
    burst_len = min(n - burst_at, int(0.015 * SR))
    y[burst_at : burst_at + burst_len] = (
        rng.standard_normal(burst_len) * np.hanning(burst_len) * 0.4
    )
    return y


def envelope(n, attack=0.02, release=0.05):
    e = np.ones(n)
    a = min(n, max(1, int(attack * SR)))
    r = min(n, max(1, int(release * SR)))
    e[:a] = np.linspace(0, 1, a)
    e[-r:] *= np.linspace(1, 0, r)
    return e


def make_utterance(dur_s, spk, rng):
    n_total = int(dur_s * SR)
    out = np.zeros(n_total)
    pos = 0
    f0_base, vt_scale, rate = spk
    while pos < n_total:
        kind = rng.choice(
            ["vowel", "vowel", "vowel", "fric", "nasal", "stop", "pause"],
        )
        dur = rng.uniform(0.06, 0.25) / rate
        n = min(int(dur * SR), n_total - pos)
        if n < 32:
            break
        if kind == "pause":
            pos += n
            continue
        # per-segment pitch contour: declination + random excursion
        f0_start = f0_base * rng.uniform(0.9, 1.25)
        f0_end = f0_start * rng.uniform(0.85, 1.1)
        f0 = np.linspace(f0_start, f0_end, n)
        if kind == "vowel":
            v = VOWELS[rng.choice(list(VOWELS))]
            seg = vowel_segment(n, f0, v, vt_scale, rng)
        elif kind == "nasal":
            seg = nasal_segment(n, f0, vt_scale, rng)
        elif kind == "fric":
            seg = fricative_segment(n, FRIC_BANDS[rng.choice(list(FRIC_BANDS))], rng)
        else:
            seg = stop_segment(n, rng)
        peak = np.max(np.abs(seg)) + 1e-9
        seg = seg / peak * rng.uniform(0.5, 1.0) * envelope(n)
        out[pos : pos + n] += seg
        pos += n
    out = out / (np.max(np.abs(out)) + 1e-9) * 0.8
    return out.astype(np.float32)


def make_speaker(rng):
    f0 = float(np.exp(rng.uniform(np.log(85), np.log(280))))
    vt = float(rng.uniform(0.85, 1.2))
    rate = float(rng.uniform(0.8, 1.3))
    return (f0, vt, rate)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data_synth")
    ap.add_argument("--train_speakers", type=int, default=60)
    ap.add_argument("--dev_speakers", type=int, default=10)
    ap.add_argument("--utt_per_speaker", type=int, default=16)
    ap.add_argument("--dur_s", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    # dev-clean holds out UTTERANCES of the train speakers (plus extra unseen
    # speakers when dev_speakers > 0), so reduced-scale quality runs measure
    # reconstruction on in-distribution voices
    speakers = [make_speaker(rng) for _ in range(args.train_speakers + args.dev_speakers)]
    n_dev_utt = max(4, args.utt_per_speaker // 4)
    for split in ("train-clean-100", "dev-clean"):
        if split == "train-clean-100":
            todo = [(s, speakers[s], args.utt_per_speaker, 0)
                    for s in range(args.train_speakers)]
        else:
            todo = [(s, speakers[s], n_dev_utt, 1000)
                    for s in range(args.train_speakers)]
            todo += [(args.train_speakers + i, speakers[args.train_speakers + i],
                      n_dev_utt, 1000) for i in range(args.dev_speakers)]
        for s, spk, utt, base in todo:
            d = os.path.join(args.out, split, str(s), "0")
            os.makedirs(d, exist_ok=True)
            for u in range(utt):
                wav = make_utterance(args.dur_s, spk, rng)
                write_wav(os.path.join(d, f"{s}-0-{base + u}.wav"), wav, SR)
        print(f"{split}: {len(todo)} speakers x {args.dur_s}s", flush=True)


if __name__ == "__main__":
    main()
