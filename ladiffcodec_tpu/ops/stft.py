"""STFT / mel-spectrogram on XLA's native FFT.

TPU-native counterpart of the torchaudio transforms the reference leans on
(srcs/msstftd.py:65-67, srcs/losses/losses_fn.py:25-28).  Semantics match
torchaudio defaults used there: periodic Hann window, center=False,
``normalized=True`` divides by ||window||₂, HTK mel scale with no filterbank
norm, f_min=0, f_max=sr/2.

Framing is a reshape+gather with static shapes; XLA fuses window multiply
into the FFT's input. All inputs are (B, L) or (B, C, L) waveforms.
"""

from __future__ import annotations

import functools
import math
import typing as tp

import numpy as np
import jax.numpy as jnp


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann, torch.hann_window default."""
    n = np.arange(win_length)
    return (0.5 * (1.0 - np.cos(2.0 * math.pi * n / win_length))).astype(np.float32)


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(..., L) -> (..., n_frames, frame_length), center=False."""
    L = x.shape[-1]
    n_frames = 1 + (L - frame_length) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: tp.Optional[int] = None,
    normalized: bool = True,
) -> jnp.ndarray:
    """Complex STFT, (..., L) -> (..., n_fft//2+1, n_frames).

    center=False (the reference's discriminator/mel settings), window applied
    per frame, optional 1/||w||₂ normalization (torchaudio normalized=True).
    """
    win_length = win_length or n_fft
    window = jnp.asarray(hann_window(win_length))
    frames = frame_signal(x, win_length, hop_length) * window
    if win_length < n_fft:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - win_length)]
        frames = jnp.pad(frames, pad)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (..., n_frames, freq)
    if normalized:
        spec = spec / jnp.sqrt(jnp.sum(window ** 2))
    return jnp.swapaxes(spec, -1, -2)  # (..., freq, n_frames)


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    n_freqs: int, n_mels: int, sample_rate: int, f_min: float = 0.0, f_max: tp.Optional[float] = None
) -> np.ndarray:
    """(n_freqs, n_mels) triangular HTK filterbank, torchaudio
    `melscale_fbanks(norm=None, mel_scale='htk')`."""
    f_max = f_max or sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = _mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_spectrogram(
    x: jnp.ndarray,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    win_length: tp.Optional[int] = None,
    n_mels: int = 64,
    power: float = 1.0,
    normalized: bool = True,
) -> jnp.ndarray:
    """(..., L) -> (..., n_mels, n_frames).  torchaudio MelSpectrogram with
    center=False (reference losses_fn.py:25-28 settings)."""
    spec = stft(x, n_fft, hop_length, win_length, normalized=normalized)
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag ** power
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate))
    # (..., freq, t) x (freq, mels) -> (..., mels, t)
    return jnp.einsum("...ft,fm->...mt", mag, fb)
