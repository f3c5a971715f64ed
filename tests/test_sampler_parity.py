"""Deterministic sampler-math parity vs the reference GaussianDiffusion1D:
schedule buffers, model_predictions, and the posterior mean/variance — the
noise-free parts of every sampler step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ref_shim import reference_modules, _load, REF
from ladiffcodec_tpu.diffusion import GaussianDiffusion1D, make_schedule


@pytest.fixture(scope="module")
def ref_ddpm():
    ref = reference_modules()  # registers refmod package
    ddpm = _load("refmod", f"{REF}/losses", "ddpm_loss")

    class Eps(torch.nn.Module):
        channels = 4
        self_condition = False

        def forward(self, x, t, cond=None):
            return 0.3 * x + 0.05 * t.float().view(-1, 1, 1)

    gd = ddpm.GaussianDiffusion1D(model=Eps(), seq_length=16).eval()
    return gd


def test_schedule_buffers_match(ref_ddpm):
    s = make_schedule(1000, "cosine")
    for name in [
        "betas",
        "alphas_cumprod",
        "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod",
        "posterior_variance",
        "posterior_log_variance_clipped",
        "posterior_mean_coef1",
        "posterior_mean_coef2",
        "p2_loss_weight",
    ]:
        ours = np.asarray(getattr(s, name))
        theirs = getattr(ref_ddpm, name).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=1e-7, err_msg=name)


def test_p_mean_variance_matches(ref_ddpm):
    gd = GaussianDiffusion1D(schedule=make_schedule(1000, "cosine"))

    def model_fn(x, t, cond):
        return 0.3 * x + 0.05 * t.astype(jnp.float32)[:, None, None]

    rng = np.random.RandomState(0)
    x_np = rng.randn(2, 4, 16).astype(np.float32)  # torch BCL
    t_np = np.array([17, 941])

    with torch.no_grad():
        mean_t, var_t, logvar_t, x0_t = ref_ddpm.p_mean_variance(
            torch.from_numpy(x_np), torch.from_numpy(t_np), clip_denoised=True
        )

    x_j = jnp.asarray(x_np.transpose(0, 2, 1))  # NLC
    t_j = jnp.asarray(t_np)
    preds = gd.model_predictions(model_fn, x_j, t_j)
    x0_j = jnp.clip(preds.pred_x_start, -1.0, 1.0)
    mean_j, var_j, logvar_j = gd.q_posterior(x0_j, x_j, t_j)

    np.testing.assert_allclose(
        np.asarray(mean_j).transpose(0, 2, 1), mean_t.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logvar_j)[:, 0, 0], logvar_t.numpy()[:, 0, 0], rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(x0_j).transpose(0, 2, 1), x0_t.numpy(), rtol=1e-4, atol=1e-5
    )


def test_q_sample_and_ddim_coefs_match(ref_ddpm):
    gd = GaussianDiffusion1D(schedule=make_schedule(1000, "cosine"))
    rng = np.random.RandomState(1)
    x0 = rng.randn(1, 4, 16).astype(np.float32)
    noise = rng.randn(1, 4, 16).astype(np.float32)
    t = np.array([500])
    with torch.no_grad():
        xt_t = ref_ddpm.q_sample(
            torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(noise)
        )
    xt_j = gd.q_sample(
        jnp.asarray(x0.transpose(0, 2, 1)), jnp.asarray(t), jnp.asarray(noise.transpose(0, 2, 1))
    )
    np.testing.assert_allclose(
        np.asarray(xt_j).transpose(0, 2, 1), xt_t.numpy(), rtol=1e-5, atol=1e-6
    )
