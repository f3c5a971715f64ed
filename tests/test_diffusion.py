"""Diffusion process contracts: schedule values vs the reference float64
recipe, q_sample algebra, loss finiteness, and sampler shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ladiffcodec_tpu.diffusion import (
    GaussianDiffusion1D,
    make_schedule,
    cosine_beta_schedule,
    linear_beta_schedule,
)

pytestmark = pytest.mark.slow  # compile-heavy; excluded from `pytest -m 'not slow'`


def test_cosine_schedule_reference_values():
    betas = cosine_beta_schedule(1000)
    assert betas.shape == (1000,)
    assert betas[0] == pytest.approx(
        float(1 - (np.cos((1 / 1000 + 0.008) / 1.008 * np.pi / 2) ** 2)
              / (np.cos(0.008 / 1.008 * np.pi / 2) ** 2)), rel=1e-6
    )
    assert np.all(betas > 0) and np.all(betas <= 0.999)
    assert betas[-1] == pytest.approx(0.999)  # clipped tail


def test_linear_schedule_endpoints():
    betas = linear_beta_schedule(1000)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)


def test_schedule_identities():
    s = make_schedule(100)
    a = np.asarray(s.alphas_cumprod)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_recipm1_alphas_cumprod), np.sqrt(1 / a - 1), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s.posterior_variance[1:]),
        np.asarray(s.betas[1:]) * (1 - a[:-1]) / (1 - a[1:]),
        rtol=1e-4,
    )


def _toy_model(x, t, cond):
    # deterministic pseudo-eps predictor with correct shape
    return 0.1 * x + 0.01 * t.astype(x.dtype)[:, None, None]


def test_q_sample_and_reconstruction_roundtrip():
    gd = GaussianDiffusion1D(schedule=make_schedule(100))
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([10, 50])
    xt = gd.q_sample(x0, t, noise)
    # invert: predict_start_from_noise(xt, t, noise) == x0
    rec = gd.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-4)
    # and predict_noise_from_start inverts the other way
    n2 = gd.predict_noise_from_start(xt, t, x0)
    np.testing.assert_allclose(np.asarray(n2), np.asarray(noise), rtol=1e-2, atol=1e-3)


def test_training_loss_and_grad():
    gd = GaussianDiffusion1D(schedule=make_schedule(50))
    x0 = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 8))

    @jax.jit
    def f(x0):
        loss, pred_x0, xt, t = gd(_toy_model, x0, jax.random.PRNGKey(1))
        return loss, (pred_x0, xt, t)

    (loss, (pred_x0, xt, t)) = f(x0)
    assert np.isfinite(float(loss))
    assert pred_x0.shape == x0.shape and xt.shape == x0.shape and t.shape == (3,)
    g = jax.grad(lambda x: f(x)[0])(x0)
    assert np.isfinite(np.asarray(g)).all()
    # predicted_x_start must carry no gradient (stop_gradient branch)
    g2 = jax.grad(lambda x: jnp.sum(f(x)[1][0]))(x0)
    np.testing.assert_array_equal(np.asarray(g2), 0.0)


@pytest.mark.parametrize("sampler", ["halfway", "ddim", "ancestral", "ddim_from"])
def test_samplers_shapes_and_finiteness(sampler):
    gd = GaussianDiffusion1D(schedule=make_schedule(50))
    key = jax.random.PRNGKey(0)
    shape = (1, 16, 4)
    cond = jax.random.normal(jax.random.PRNGKey(2), shape)
    if sampler == "halfway":
        img = jax.random.normal(jax.random.PRNGKey(3), shape)
        out = jax.jit(lambda: gd.halfway_sampling(_toy_model, img, 10, key, cond))()
    elif sampler == "ddim":
        out = jax.jit(lambda: gd.ddim_sample(_toy_model, shape, key, cond, sampling_timesteps=7))()
    elif sampler == "ddim_from":
        img = jax.random.normal(jax.random.PRNGKey(3), shape)
        out = jax.jit(lambda: gd.ddim_from(_toy_model, img, 10, 5, key, cond))()
    else:
        out = jax.jit(lambda: gd.p_sample_loop(_toy_model, shape, key, cond))()
    assert out.shape == shape
    assert np.isfinite(np.asarray(out)).all()


def test_interpolate_and_infilling():
    gd = GaussianDiffusion1D(schedule=make_schedule(20))
    x1 = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 2))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 2))
    out = gd.interpolate(_toy_model, x1, x2, jax.random.PRNGKey(2), t=10)
    assert out.shape == x1.shape
    out = gd.infilling(_toy_model, x1, x2, 5, jax.random.PRNGKey(3))
    assert out.shape == x1.shape
