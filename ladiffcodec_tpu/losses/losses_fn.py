"""Objective functions (reference srcs/losses/losses_fn.py).

All waveform args are NLC (B, L, C) or (B, L); internally flattened to
(B, n_src, L) where needed.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp

from ..ops.stft import mel_spectrogram


def _as_bcl(x: jnp.ndarray) -> jnp.ndarray:
    """(B, L) | (B, L, C) -> (B, C, L)."""
    if x.ndim == 2:
        return x[:, None, :]
    return jnp.swapaxes(x, -1, -2)


def melspec_loss_fn(
    s: jnp.ndarray,
    s_hat: jnp.ndarray,
    n_freq: tp.Sequence[int],
    sample_rate: int = 16000,
    compat: bool = False,
) -> jnp.ndarray:
    """Multi-scale mel L1+L2 loss over n_fft = 2**n for n in n_freq.

    The reference builds every scale but — due to a loop-indentation bug
    (losses_fn.py:23-35) — only the LAST n_fft contributes, divided by 8·L.
    `compat=True` reproduces that exactly; the default sums all scales (the
    intended loss), same 8·L normalizer per scale.
    """
    s = _as_bcl(s)
    s_hat = _as_bcl(s_hat)
    sl = s.shape[-1]
    scales = [list(n_freq)[-1]] if compat else list(n_freq)
    loss = 0.0
    for n in scales:
        n_fft = 2 ** n
        mel_s = mel_spectrogram(
            s, sample_rate, n_fft=n_fft, hop_length=n_fft // 4, n_mels=64, power=1.0
        )
        mel_h = mel_spectrogram(
            s_hat, sample_rate, n_fft=n_fft, hop_length=n_fft // 4, n_mels=64, power=1.0
        )
        d = mel_s - mel_h
        loss = loss + jnp.sum(jnp.abs(d)) + jnp.sum(d ** 2)
    return loss / (8.0 * sl)


def prior_loss_fn(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """VAE KL against a unit Gaussian (reference losses_fn.py:40-53)."""
    return 0.5 * jnp.mean(mu ** 2 + jnp.exp(logvar) - logvar - 1.0)


def neg_sdsdr(
    est: jnp.ndarray, target: jnp.ndarray, zero_mean: bool = True, eps: float = 1e-8
) -> jnp.ndarray:
    """Negative scale-dependent SDR, asteroid `MultiSrcNegSDR("sdsdr")`
    (vendored formula; reference losses_fn.py:56-65 wraps it):
    scaled target s = <e,t>t/‖t‖², noise n = e − t, −10·log10(‖s‖²/‖n‖²).
    Returns (B,): negative mean over sources.
    """
    e = _as_bcl(est)
    t = _as_bcl(target)
    if zero_mean:
        e = e - jnp.mean(e, axis=-1, keepdims=True)
        t = t - jnp.mean(t, axis=-1, keepdims=True)
    dot = jnp.sum(e * t, axis=-1, keepdims=True)
    t_energy = jnp.sum(t ** 2, axis=-1, keepdims=True) + eps
    scaled = dot * t / t_energy
    noise = e - t  # sd-sdr: unscaled residual
    ratio = jnp.sum(scaled ** 2, axis=-1) / (jnp.sum(noise ** 2, axis=-1) + eps)
    sdr = 10.0 * jnp.log10(ratio + eps)
    return -jnp.mean(sdr, axis=-1)


def sdr_loss(est: jnp.ndarray, target: jnp.ndarray, clip_value: float = -30.0) -> jnp.ndarray:
    """ClippedSDR (reference losses_fn.py:56-65): clamp(neg_sdsdr, min=-30).
    NOTE the reference calls this as sdr_loss(clean, reconstruction) — clean
    is the "estimate" — and we keep that argument order."""
    return jnp.maximum(neg_sdsdr(est, target), clip_value)


def cal_sdr(s: jnp.ndarray, s_hat: jnp.ndarray) -> jnp.ndarray:
    """Plain SDR eval metric (reference losses_fn.py:68-76)."""
    s = _as_bcl(s).reshape(s.shape[0], -1)
    s_hat = _as_bcl(s_hat).reshape(s_hat.shape[0], -1)
    return jnp.mean(
        -10.0 * jnp.log10(jnp.sum((s - s_hat) ** 2, -1) / jnp.sum(s ** 2, -1))
    )
