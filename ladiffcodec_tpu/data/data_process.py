"""Offline data preparation: slice 16 kHz speech into fixed-length chunks
(`python -m ladiffcodec_tpu.data.data_process IN_GLOB OUT_DIR`).

Counterpart of reference srcs/encodec/data_process.py:11-30 (which writes
5 s torch `.pth` chunks); we write `.npy` (and the chunk dataset reads both).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from .audio_io import read_wav, resample


def make_chunks(
    in_glob: str,
    out_dir: str,
    seconds: float = 5.0,
    sample_rate: int = 16000,
    per_speaker_dirs: bool = True,
) -> int:
    n = 0
    for path in sorted(glob.glob(in_glob, recursive=True)):
        audio, sr = read_wav(path)
        audio = resample(audio, sr, sample_rate)[0]
        # reference stores int16-scaled values; keep that contract so
        # EnCodecData's /32768 normalization applies unchanged
        audio = np.clip(audio, -1, 1) * 32768.0
        chunk = int(seconds * sample_rate)
        base = os.path.splitext(os.path.basename(path))[0]
        spk = base.split("-")[0] if per_speaker_dirs else "all"
        d = os.path.join(out_dir, spk)
        os.makedirs(d, exist_ok=True)
        for i in range(len(audio) // chunk):
            np.save(os.path.join(d, f"{base}_{i}.npy"),
                    audio[i * chunk : (i + 1) * chunk].astype(np.float32))
            n += 1
    return n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("in_glob")
    p.add_argument("out_dir")
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--sample_rate", type=int, default=16000)
    args = p.parse_args(argv)
    n = make_chunks(args.in_glob, args.out_dir, args.seconds, args.sample_rate)
    print(f"wrote {n} chunks to {args.out_dir}")


if __name__ == "__main__":
    main()
