"""Objective algebra for pred_noise / pred_x0 / pred_v (reference trains
pred_noise only, ddpm_loss.py:84-110; the x0/v parameterizations are the
TPU-native extensions used by the stage-3 retrains).

Identities tested per objective, on the same schedule the trainer builds:
  * an ORACLE model (returns the exact target) drives p_losses to ~0 and
    model_predictions back to the true (x0, eps) pair;
  * the three parameterizations are algebraically interchangeable at any t.
"""

import jax
import jax.numpy as jnp
import pytest

from ladiffcodec_tpu.diffusion.gaussian import GaussianDiffusion1D, make_schedule


def _gd(objective, snr_scale=1.0):
    return GaussianDiffusion1D(
        schedule=make_schedule(timesteps=100, snr_scale=snr_scale),
        objective=objective,
        loss_type="l1",
    )


def _setup(seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    x0 = 0.5 * jax.random.normal(k1, (2, 40, 3))
    eps = jax.random.normal(k2, (2, 40, 3))
    t = jnp.array([7, 63], jnp.int32)
    return x0, eps, t


@pytest.mark.parametrize("snr_scale", [1.0, 1.0 / 0.065])
@pytest.mark.parametrize("objective", ["pred_noise", "pred_x0", "pred_v"])
def test_oracle_model_zero_loss_and_recovery(objective, snr_scale):
    gd = _gd(objective, snr_scale)
    x0, eps, t = _setup()
    x_t = gd.q_sample(x0, t, eps)

    target = {
        "pred_noise": eps,
        "pred_x0": x0,
        "pred_v": gd.predict_v(x0, t, eps),
    }[objective]

    def oracle(x, tt, cond):
        return target

    # model_predictions recovers the true (eps, x0) pair from any objective
    pred = gd.model_predictions(oracle, x_t, t, cond=None)
    assert jnp.allclose(pred.pred_x_start, x0, atol=1e-4)
    assert jnp.allclose(pred.pred_noise, eps, atol=1e-3)

    # p_losses against the oracle: the loss term is |model_out - target| = 0
    # (p_losses draws its own noise, so pass the oracle for THAT draw instead)
    def oracle_fn(x, tt, cond):
        # reconstruct the target from (x, t): true x0 is closed over
        if objective == "pred_noise":
            return gd.predict_noise_from_start(x, tt, x0)
        if objective == "pred_x0":
            return x0
        eps_t = gd.predict_noise_from_start(x, tt, x0)
        return gd.predict_v(x0, tt, eps_t)

    loss, pred_x_start, x_t2 = gd.p_losses(
        oracle_fn, x0, t, jax.random.PRNGKey(3), cond=None
    )
    assert float(jnp.max(loss)) < 1e-4
    assert jnp.allclose(pred_x_start, x0, atol=1e-4)


@pytest.mark.parametrize("snr_scale", [1.0, 1.0 / 0.065])
def test_parameterizations_interchangeable(snr_scale):
    """predict_* round-trips: x0 <-> eps <-> v are bijections at every t."""
    gd = _gd("pred_noise", snr_scale)
    x0, eps, t = _setup(1)
    x_t = gd.q_sample(x0, t, eps)

    eps_rt = gd.predict_noise_from_start(x_t, t, x0)
    assert jnp.allclose(eps_rt, eps, atol=1e-3)

    x0_rt = gd.predict_start_from_noise(x_t, t, eps)
    assert jnp.allclose(x0_rt, x0, atol=1e-4)

    v = gd.predict_v(x0, t, eps)
    x0_from_v = gd.predict_start_from_v(x_t, t, v)
    assert jnp.allclose(x0_from_v, x0, atol=1e-4)
