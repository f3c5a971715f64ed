"""SNR-shifted diffusion schedule (make_schedule snr_scale=...).

The shift exists because the reference's max-abs latent normalization
(srcs/model.py:122-143) leaves the scaled latent's RMS far below the unit
diffusion noise; shifting alpha-bar restores a unit-std effective SNR
trajectory without touching the data path (gaussian.py make_schedule).

Exact SNR identities are checked on the float64 helper
(shift_alphas_cumprod); the schedule-buffer checks allow float32 storage
rounding (alpha-bar sits within 1e-7 of 1.0 at t=0).
"""

import numpy as np
import pytest

from ladiffcodec_tpu.diffusion.gaussian import (
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
    shift_alphas_cumprod,
)


def _np(x):
    return np.asarray(x, dtype=np.float64)


def _base_ac(sched, T):
    betas = cosine_beta_schedule(T) if sched == "cosine" else linear_beta_schedule(T)
    return np.cumprod(1.0 - betas)


def test_identity_when_scale_is_one():
    a = make_schedule(100, "cosine")
    b = make_schedule(100, "cosine", snr_scale=1.0)
    np.testing.assert_array_equal(_np(a.alphas_cumprod), _np(b.alphas_cumprod))
    np.testing.assert_array_equal(_np(a.betas), _np(b.betas))


@pytest.mark.parametrize("sched", ["cosine", "linear"])
@pytest.mark.parametrize("s", [14.3, 4.0])
def test_effective_snr_matches_unit_std(sched, s):
    """SNR'_t * (1/s)^2 == SNR_t exactly (float64 helper): data of std 1/s
    under the shifted schedule sees the base schedule's unit-std SNRs."""
    base = _base_ac(sched, 200)
    shif = shift_alphas_cumprod(base, s)
    snr_base = base / (1.0 - base)
    snr_shif = shif / (1.0 - shif)
    np.testing.assert_allclose(snr_shif / s**2, snr_base, rtol=1e-9)


def test_shifted_schedule_buffers_consistent():
    sch = make_schedule(1000, "cosine", snr_scale=14.3)
    ac = _np(sch.alphas_cumprod)
    betas = _np(sch.betas)
    # valid probabilities, strictly decreasing alpha-bar
    assert np.all(betas > 0) and np.all(betas < 1)
    assert np.all(np.diff(ac) < 0)
    assert 0 < ac[-1] < 0.05  # terminal state still ~pure noise
    # stored (f32) alpha-bar tracks the exact f64 shift
    exact = shift_alphas_cumprod(_base_ac("cosine", 1000), 14.3)
    np.testing.assert_allclose(ac, exact, rtol=2e-5, atol=1e-7)
    # derived buffers follow the SHIFTED alpha-bar, not the base one
    np.testing.assert_allclose(
        _np(sch.sqrt_one_minus_alphas_cumprod), np.sqrt(1.0 - exact),
        rtol=1e-3, atol=1e-6,
    )
    prev = np.concatenate([[1.0], ac[:-1]])
    np.testing.assert_allclose(_np(sch.alphas_cumprod_prev), prev, rtol=1e-6)
    # posterior variance consistent with its own (f32) betas/alpha-bar
    post_var = betas * (1.0 - prev) / (1.0 - ac)
    np.testing.assert_allclose(_np(sch.posterior_variance), post_var,
                               rtol=2e-2, atol=2e-8)


def test_shift_raises_low_t_noise_floor():
    """The practical point: at the same t the shifted schedule keeps the
    (tiny-RMS) signal ABOVE the injected noise where the base schedule
    drowns it."""
    data_std = 0.07
    base = _base_ac("cosine", 1000)
    shif = shift_alphas_cumprod(base, 1 / data_std)
    t = 100
    snr_eff_base = base[t] / (1 - base[t]) * data_std**2
    snr_eff_shif = shif[t] / (1 - shif[t]) * data_std**2
    assert snr_eff_base < 1.0  # signal below noise: the round-2/3 failure mode
    assert snr_eff_shif > 10.0  # shifted: signal safely above noise at low t


def test_diff_rep_data_std_plumbs_to_schedule():
    from ladiffcodec_tpu.models.diff_rep import DiffAudioRep

    m = DiffAudioRep(run_diff=True, data_std=0.07)
    ac = _np(m.diffusion.schedule.alphas_cumprod)
    exact = shift_alphas_cumprod(_base_ac("cosine", 1000), 1 / 0.07)
    np.testing.assert_allclose(ac, exact, rtol=2e-5, atol=1e-7)
