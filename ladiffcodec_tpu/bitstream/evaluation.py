"""Codec evaluation: encode/quantize/decode validation items, write
reference/reconstruction wav pairs and SI-SNR/SDR metrics
(`python -m ladiffcodec_tpu.bitstream.evaluation`).

Counterpart of reference srcs/encodec/evaluation.py:96-150, plus the metric
readout the reference leaves to offline tools.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax


from .encodec_model import EncodecModel
from ..data.librispeech import DatasetLibri
from ..data.audio_io import write_wav
# (si_snr implemented below; sdr metrics available from ..losses)


def si_snr(ref: np.ndarray, est: np.ndarray, eps: float = 1e-8) -> float:
    """Scale-invariant SNR in dB (the BASELINE.json quality metric)."""
    ref = ref - ref.mean()
    est = est - est.mean()
    s = np.dot(est, ref) * ref / (np.dot(ref, ref) + eps)
    e = est - s
    return float(10 * np.log10((np.dot(s, s) + eps) / (np.dot(e, e) + eps)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_folder_path", type=str, required=True)
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--output_dir", type=str, default="eval_wavs")
    p.add_argument("--bandwidth", type=float, default=1.5)
    p.add_argument("--n_items", type=int, default=4)
    p.add_argument("--seq_len_p_sec", type=float, default=2.0)
    args = p.parse_args(argv)

    model = EncodecModel(
        target_bandwidths=[args.bandwidth], sample_rate=16000, channels=1,
        causal=True, name="encodec_24khz",
    )
    model.set_target_bandwidth(args.bandwidth)
    variables = model.init_variables(jax.random.PRNGKey(0))
    if args.weights:
        from ..utils.checkpoint import load_checkpoint_path

        variables = load_checkpoint_path(variables, args.weights)

    ds = DatasetLibri("eval", args.seq_len_p_sec, args.data_folder_path)
    os.makedirs(args.output_dir, exist_ok=True)
    scores = []
    for i in range(min(args.n_items, len(ds))):
        seg = ds[i]
        x = seg[None, :, None]
        y = model.forward(variables, x)[0, :, 0]
        write_wav(os.path.join(args.output_dir, f"{i}_ref.wav"), seg, 16000)
        write_wav(os.path.join(args.output_dir, f"{i}_rec.wav"), np.asarray(y), 16000)
        scores.append(si_snr(seg, np.asarray(y)))
        print(f"item {i}: si-snr {scores[-1]:.2f} dB")
    print(f"mean si-snr over {len(scores)} items: {np.mean(scores):.2f} dB")


if __name__ == "__main__":
    main()
