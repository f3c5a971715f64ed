"""Tensor-parallel (dp × tp) sharding via GSPMD param annotations.

The reference has no TP/PP (models are 10-100 M params — SURVEY.md §2.8),
so data parallelism is the primary axis here too.  But the serving story
benefits from a second mesh axis: sharding every feature/out-channel
dimension of the UNet/SEANet weights over 'tp' lets XLA partition the convs
and matmuls channel-wise (GSPMD inserts the all-reduces), which cuts
per-chip HBM for weights and activations when batch alone cannot fill a
slice.

Usage:
    mesh = make_tp_mesh(dp=4, tp=2)
    specs = tp_param_specs(params, mesh)        # pytree of PartitionSpec
    step = jit_dp_tp_train_step(step_fn, mesh, specs)
"""

from __future__ import annotations

import typing as tp

import numpy as np
import jax

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TP_AXIS = "tp"
DP_AXIS = "dp"


def make_tp_mesh(dp: int, tp_size: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    assert dp * tp_size <= len(devices), (dp, tp_size, len(devices))
    arr = np.array(devices[: dp * tp_size]).reshape(dp, tp_size)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def tp_param_specs(params, mesh: Mesh, min_size: int = 128):
    """Shard the trailing (features / out-channels) axis of every large
    weight over 'tp'; small params stay replicated."""
    tp_size = mesh.shape[TP_AXIS]

    def spec(leaf):
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.shape[-1] >= min_size
            and leaf.shape[-1] % tp_size == 0
        ):
            return P(*([None] * (leaf.ndim - 1)), TP_AXIS)
        return P()

    return jax.tree_util.tree_map(spec, params)


def shard_params(params, mesh: Mesh, specs):
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def jit_dp_tp_train_step(step_fn, mesh: Mesh, state_specs, donate: bool = True):
    """jit a step(state, batch, key) with: state sharded per `state_specs`
    (params over tp, everything else replicated), batch split over dp.
    GSPMD propagates the shardings and inserts the collectives — no
    shard_map / explicit psum needed on this path."""
    to_sharding = lambda tree: jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), tree,
        is_leaf=lambda x: isinstance(x, P),
    )
    in_shardings = (
        to_sharding(state_specs),
        NamedSharding(mesh, P(DP_AXIS)),
        NamedSharding(mesh, P()),
    )
    out_shardings = (to_sharding(state_specs), NamedSharding(mesh, P()))
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(0,) if donate else (),
    )
