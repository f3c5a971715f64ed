"""dp x tp sharded training step on the 8-device CPU mesh: GSPMD partitions
the UNet channel dims over tp, batch over dp; result must match the
single-device step."""

import pytest
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

pytestmark = pytest.mark.slow  # compile-heavy; excluded from `pytest -m 'not slow'`


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


def test_dcn_two_level_mesh_matches_flat_dp():
    """Hierarchical ('dcn', 'dp') 2x4 DP step == flat 8-way DP step ==
    single-device step on the same global batch (multi-slice readiness,
    reference capability srcs/encodec/manual_dist_train.py:113,130)."""
    from ladiffcodec_tpu.parallel.mesh import make_mesh, dp_axis_names
    from ladiffcodec_tpu.training import shard_map_step

    model = DiffAudioRep(
        rep_dims=16, n_filters=4, lstm=0, enc_ratios=(8, 5, 4),
        quantization=True, bandwidth=1.5, rvq_kmeans_init=False,
    )
    B, L = 8, 640
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, 1)) * 0.1
    v = model.init(jax.random.PRNGKey(1), x)
    # sgd, not adam: adam's first step is lr*sign(m), which amplifies
    # reduction-order FP noise on near-zero grads to a full 2*lr
    opt = optax.sgd(1e-3)

    def fresh_state():
        return TrainState(
            step=jnp.asarray(0), params=v["params"], quantizer=v["quantizer"],
            opt_state=opt.init(v["params"]),
        )

    # single-device reference (full batch, no collectives)
    ref_state, ref_losses = jax.jit(make_train_step(model, opt))(
        fresh_state(), x, jax.random.PRNGKey(2)
    )

    results = {}
    for name, mesh in (
        ("flat", make_mesh(8)),
        ("dcn", make_mesh(8, dcn_slices=2)),
    ):
        axes = dp_axis_names(mesh)
        if name == "dcn":
            assert mesh.devices.shape == (2, 4) and axes == ("dcn", "dp")
        step = shard_map_step(make_train_step(model, opt, axis_name=axes), mesh)
        out_state, losses = step(fresh_state(), x, jax.random.PRNGKey(2))
        results[name] = (out_state, losses)
        np.testing.assert_allclose(
            float(losses["tot_loss"]), float(ref_losses["tot_loss"]), rtol=1e-4
        )
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            out_state.params, ref_state.params,
        )
        assert max(jax.tree_util.tree_leaves(d)) < 2e-4, name

    # RVQ EMA stats identical across topologies (dead-code expiry samples
    # from shard 0's rows, which are the same rows in both 8-shard layouts;
    # the single-device run samples from the full batch, so it is excluded)
    dq = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(
            jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)))),
        results["flat"][0].quantizer, results["dcn"][0].quantizer,
    )
    assert max(jax.tree_util.tree_leaves(dq)) < 1e-4
