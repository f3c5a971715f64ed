"""Balancer-based EnCodec GAN trainer step + EMA schedule tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from ladiffcodec_tpu.bitstream.encodec_model import EncodecModel
from ladiffcodec_tpu.bitstream.train import EncodecTrainState, make_encodec_gan_step
from ladiffcodec_tpu.models.msstftd import MultiScaleSTFTDiscriminator
from ladiffcodec_tpu.losses.balancer import Balancer
pytestmark = pytest.mark.slow  # compile-heavy; excluded from `pytest -m 'not slow'`


def test_gan_trainer_step_runs_and_updates():
    model = EncodecModel(
        target_bandwidths=[1.5], sample_rate=16000, channels=1, causal=True,
        ratios=(8, 5, 4, 2), dimension=16, name="tiny",
    )
    model.encoder = type(model.encoder)(
        channels=1, causal=True, ratios=(8, 5, 4, 2), dimension=16, n_filters=4, lstm=0)
    model.decoder = type(model.decoder)(
        channels=1, causal=True, ratios=(8, 5, 4, 2), dimension=16, n_filters=4, lstm=0)
    from ladiffcodec_tpu.quantization.rvq import ResidualVectorQuantizer
    model.quantizer = ResidualVectorQuantizer(dimension=16, n_q=3, bins=64,
                                              kmeans_init=False)
    variables = model.init_variables(jax.random.PRNGKey(0), example_len=3200)

    disc = MultiScaleSTFTDiscriminator(filters=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3200, 1)) * 0.1
    disc_vars = disc.init(jax.random.PRNGKey(2), x)

    opt = optax.adam(1e-4)
    dopt = optax.adam(1e-4)
    balancer = Balancer({"l_t": 0.1, "l_f": 1.0, "l_g": 3.0, "l_feat": 3.0})

    params = {"encoder": variables["encoder"], "decoder": variables["decoder"]}
    state = EncodecTrainState(
        step=jnp.asarray(0), params=params, rvq=variables["rvq"],
        opt_state=opt.init(params), disc_params=disc_vars["params"],
        disc_opt_state=dopt.init(disc_vars["params"]),
        balancer_state=balancer.init_state(),
    )
    gen_step, disc_step = make_encodec_gan_step(model, disc, opt, dopt, balancer, n_q=3)
    gen_step = jax.jit(gen_step)
    disc_step = jax.jit(disc_step)

    state2, metrics, s_hat = gen_step(state, x, jax.random.PRNGKey(3))
    assert s_hat.shape == x.shape
    assert all(np.isfinite(float(v)) for v in metrics.values())
    # params actually moved
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                               state.params, state2.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0
    # balancer EMA state updated
    assert float(list(state2.balancer_state.fix.values())[0]) > 0

    state3, l_d = disc_step(state2, x, s_hat)
    assert np.isfinite(float(l_d))
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                               state2.disc_params, state3.disc_params)
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_ema_schedule_and_update():
    from ladiffcodec_tpu.utils.ema import EMAState, ema_update, ema_decay_schedule

    # schedule: zero during warmup, ramps toward beta
    assert float(ema_decay_schedule(jnp.asarray(50), update_after_step=100)) == 0.0
    d1 = float(ema_decay_schedule(jnp.asarray(1000)))
    d2 = float(ema_decay_schedule(jnp.asarray(100000)))
    assert 0 < d1 < d2 <= 0.9999

    params = {"w": jnp.ones((3,))}
    st = EMAState.create(params)
    # before warmup: hard copy
    st = ema_update(st, {"w": jnp.full((3,), 2.0)}, update_after_step=0, update_every=1)
    np.testing.assert_allclose(np.asarray(st.params["w"]), 2.0, rtol=1e-6)
    # later: slow tracking
    st = st.replace(step=jnp.asarray(10000, jnp.int32))
    st2 = ema_update(st, {"w": jnp.zeros((3,))}, update_after_step=0, update_every=1)
    assert 0 < float(st2.params["w"][0]) < 2.0
