"""dp x tp sharded training step on the 8-device CPU mesh: GSPMD partitions
the UNet channel dims over tp, batch over dp; result must match the
single-device step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from jax.sharding import PartitionSpec as P

from ladiffcodec_tpu.models.diff_rep import DiffAudioRep
from ladiffcodec_tpu.training import TrainState, make_train_step
from ladiffcodec_tpu.parallel.tp import (
    make_tp_mesh,
    tp_param_specs,
    shard_params,
    jit_dp_tp_train_step,
)


def test_dp_tp_step_matches_single_device():
    model = DiffAudioRep(
        rep_dims=16, diff_dims=16, n_filters=4, lstm=0, enc_ratios=(8,),
        run_diff=True, model_type="unet", scaling_global=True,
    )
    B, L = 4, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, 1)) * 0.1
    v = model.init(jax.random.PRNGKey(1), x)
    opt = optax.adam(1e-3)
    state = TrainState(step=jnp.asarray(0), params=v["params"], quantizer={},
                       opt_state=opt.init(v["params"]))
    step_fn = make_train_step(model, opt)  # no axis_name: GSPMD reduces

    # single device reference
    ref_state, ref_losses = jax.jit(step_fn)(state, x, jax.random.PRNGKey(2))

    mesh = make_tp_mesh(dp=4, tp_size=2)
    pspecs = tp_param_specs(state.params, mesh, min_size=16)
    # at least one UNet kernel actually sharded over tp
    n_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(
            pspecs, is_leaf=lambda z: isinstance(z, P))
        if s != P()
    )
    assert n_sharded > 10, n_sharded

    state_specs = TrainState(
        step=P(), params=pspecs, quantizer={},
        opt_state=jax.tree_util.tree_map(
            lambda _: P(), state.opt_state,
        ),
    )
    # opt_state mirrors params: moments get the same sharding
    import optax as _o
    state_specs = state_specs.replace(
        opt_state=(
            _o.ScaleByAdamState(count=P(), mu=pspecs, nu=pspecs),
            _o.EmptyState(),
        )
    )
    sharded_state = TrainState(
        step=jnp.asarray(0),
        params=shard_params(state.params, mesh, pspecs),
        quantizer={},
        opt_state=state.opt_state,
    )
    step = jit_dp_tp_train_step(step_fn, mesh, state_specs, donate=False)
    out_state, losses = step(sharded_state, x, jax.random.PRNGKey(2))

    np.testing.assert_allclose(
        float(losses["diff_loss"]), float(ref_losses["diff_loss"]), rtol=1e-4
    )
    # updated params agree with the single-device run
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), out_state.params, ref_state.params
    )
    assert max(jax.tree_util.tree_leaves(d)) < 2e-4
