"""Numerical parity of STFT/mel/SDR against torch+torchaudio on CPU, plus
discriminator output contracts (reference msstftd.py:136-147)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ladiffcodec_tpu.ops.stft import stft, mel_spectrogram, hann_window, mel_filterbank
from ladiffcodec_tpu.losses import neg_sdsdr, sdr_loss, melspec_loss_fn, prior_loss_fn
from ladiffcodec_tpu.losses.gan import gen_loss, disc_loss

torch = pytest.importorskip("torch")


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window(1024), torch.hann_window(1024).numpy(), rtol=1e-6, atol=1e-7
    )


def test_stft_matches_torch_stft():
    """torchaudio's Spectrogram(normalized=True, center=False) is
    torch.stft(center=False) scaled by 1/||window||₂ — pin against that."""
    x = np.random.RandomState(0).randn(2, 4000).astype(np.float32)
    win = torch.hann_window(512)
    spec_t = torch.stft(
        torch.from_numpy(x), 512, hop_length=128, win_length=512, window=win,
        center=False, normalized=False, return_complex=True,
    ) / win.pow(2).sum().sqrt()
    spec_j = stft(jnp.asarray(x), 512, 128, 512, normalized=True)
    assert spec_j.shape == tuple(spec_t.shape)
    np.testing.assert_allclose(
        np.asarray(spec_j.real), spec_t.real.numpy(), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(spec_j.imag), spec_t.imag.numpy(), rtol=1e-3, atol=1e-5
    )


def test_mel_filterbank_properties():
    """HTK triangular filterbank sanity: each filter is a unimodal triangle
    peaking strictly inside (f_min, f_max), zero outside its support."""
    fb = mel_filterbank(1025, 64, 16000)
    assert fb.shape == (1025, 64)
    assert np.all(fb >= 0)
    peaks = fb.argmax(axis=0)
    assert np.all(np.diff(peaks) > 0)  # monotone center frequencies
    # mel spacing: first filter peaks in low hundreds of Hz for 16 kHz audio
    freq_per_bin = 8000 / 1024
    assert peaks[0] * freq_per_bin < 200
    assert peaks[-1] * freq_per_bin > 7000
    # pure tone at bin k must maximally excite the filter whose peak is at k
    tone_bin = int(peaks[20])
    response = fb[tone_bin]
    assert response.argmax() == 20


def test_mel_spectrogram_tone():
    """A pure 1 kHz tone concentrates energy in the right mel band."""
    sr, f0 = 16000, 1000.0
    t = np.arange(8000) / sr
    x = jnp.asarray(np.sin(2 * np.pi * f0 * t), jnp.float32)[None]
    mel = mel_spectrogram(x, sr, 2048, 512, 2048, n_mels=64, power=1.0)
    assert mel.shape[1] == 64
    band = int(np.asarray(jnp.mean(mel[0], axis=-1)).argmax())
    fb = mel_filterbank(1025, 64, sr)
    peak_freq = fb[:, band].argmax() * (sr / 2) / 1024
    assert abs(peak_freq - f0) < 150, peak_freq


def test_neg_sdsdr_matches_formula():
    rng = np.random.RandomState(2)
    e = rng.randn(3, 1, 1600).astype(np.float32)
    t = (e + 0.1 * rng.randn(3, 1, 1600)).astype(np.float32)
    # manual asteroid sdsdr
    em = e - e.mean(-1, keepdims=True)
    tm = t - t.mean(-1, keepdims=True)
    dot = np.sum(em * tm, -1, keepdims=True)
    s = dot * tm / (np.sum(tm ** 2, -1, keepdims=True) + 1e-8)
    n = em - tm
    ref = -np.mean(10 * np.log10(np.sum(s ** 2, -1) / (np.sum(n ** 2, -1) + 1e-8) + 1e-8), -1)
    out = neg_sdsdr(jnp.asarray(e.transpose(0, 2, 1)), jnp.asarray(t.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    # clipping
    bad = rng.randn(1, 1600, 1).astype(np.float32)
    worse = rng.randn(1, 1600, 1).astype(np.float32) * 100
    assert float(sdr_loss(jnp.asarray(bad), jnp.asarray(worse))[0]) >= -30.0


@pytest.mark.slow  # measured heavyweight (durations top-10); full suite still runs it
def test_melspec_loss_compat_vs_fixed():
    x = jnp.asarray(np.random.RandomState(3).randn(1, 4096, 1).astype(np.float32))
    y = x + 0.01
    l_compat = melspec_loss_fn(x, y, range(5, 12), compat=True)
    l_fixed = melspec_loss_fn(x, y, range(5, 12), compat=False)
    assert float(l_fixed) > float(l_compat) > 0.0


def test_prior_loss_zero_at_unit_gaussian():
    mu = jnp.zeros((2, 8, 4))
    logvar = jnp.zeros((2, 8, 4))
    assert float(prior_loss_fn(mu, logvar)) == pytest.approx(0.0)


@pytest.mark.slow  # measured heavyweight (durations top-10); full suite still runs it
def test_msstftd_contract():
    from ladiffcodec_tpu.models.msstftd import MultiScaleSTFTDiscriminator

    disc = MultiScaleSTFTDiscriminator(filters=8)
    y = jnp.asarray(np.random.RandomState(0).randn(1, 24000, 1).astype(np.float32))
    params = disc.init(jax.random.PRNGKey(0), y)
    logits, fmaps = disc.apply(params, y)
    assert len(logits) == len(fmaps) == 3
    assert all(len(fm) == 5 for fm in fmaps)
    assert all(f.shape[0] == 1 and f.shape[-1] == 8 for fm in fmaps for f in fm)
    assert all(l.ndim == 4 for l in logits)

    # GAN losses on real outputs
    lg, lf = gen_loss(logits, fmaps, logits, fmaps)
    assert float(lf) == pytest.approx(0.0, abs=1e-6)  # identical fmaps
    ld = disc_loss(logits, [jax.lax.stop_gradient(l) for l in logits])
    assert np.isfinite(float(ld))
