"""Debug dumps: normalized waveform plots + wavs
(reference srcs/utils.py:36-83, srcs/train.py:43-55)."""

from __future__ import annotations

import os
import typing as tp

import numpy as np


def save_plot(x, name: str, note: str = "", out_dir: str = ".") -> str:
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    x = np.asarray(x).squeeze()
    plt.plot(x / (np.max(np.abs(x)) + 1e-12))
    path = os.path.join(out_dir, f"{name}_{note}.png")
    plt.savefig(path)
    plt.clf()
    return path


def save_debug_wav(x, name: str, note: str = "", out_dir: str = "eval_wavs",
                   sample_rate: int = 16000) -> str:
    from ..data.audio_io import write_wav

    os.makedirs(out_dir, exist_ok=True)
    x = np.asarray(x).squeeze()
    path = os.path.join(out_dir, f"{note}_{name}.wav")
    write_wav(path, x / (np.max(np.abs(x)) + 1e-12), sample_rate)
    return path


def nn_parameters(params) -> int:
    """Total parameter count (reference utils.py:25)."""
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
