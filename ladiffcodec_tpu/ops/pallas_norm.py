"""Pallas TPU kernel: fused GroupNorm + FiLM + SiLU for the UNet hot path.

XLA executes Block's norm→FiLM→SiLU chain (models/unet1d.py Block) as a
reduction pass plus an apply pass — at least one extra full HBM read of the
activation per block.  This kernel does stats + normalize + affine + FiLM +
SiLU in ONE read and ONE write per example.

Group statistics are computed with 0/1-matrix matmuls instead of
lane-splitting reshapes (Mosaic-friendly: the channel axis stays the lane
axis throughout):

    col_sum  = 1_Tᵀ x                  (1, C)
    g_sum    = col_sum · M             (1, G),  M[c, g] = 1 iff c in group g
    mean_c   = (g_sum / n) · Mᵀ        (1, C)   broadcast back per channel

Inference-only (no VJP); callers gate on `not training`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, gamma_ref, beta_ref, sc_ref, sh_ref, m_ref, o_ref, *, eps, groups):
    x = x_ref[0].astype(jnp.float32)  # (T, C)
    T, C = x.shape
    M = m_ref[:]  # (C, Gp) 0/1, zero-padded beyond the real group count
    n = T * C / groups  # elements per group

    col_sum = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    col_sq = jnp.sum(x * x, axis=0, keepdims=True)
    g_sum = jnp.dot(col_sum, M, preferred_element_type=jnp.float32)  # (1, G)
    g_sq = jnp.dot(col_sq, M, preferred_element_type=jnp.float32)
    mean_g = g_sum / n
    var_g = g_sq / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)  # (1, C)
    inv_c = jnp.dot(inv_g, M.T, preferred_element_type=jnp.float32)

    y = (x - mean_c) * inv_c
    y = y * gamma_ref[:] + beta_ref[:]
    y = y * (sc_ref[0] + 1.0) + sh_ref[0]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def fused_groupnorm_film_silu(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    groups: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, T, C); gamma/beta (C,); scale/shift (B, C) (time-FiLM per
    example, broadcast over T).  Returns silu(film(groupnorm(x)))."""
    B, T, C = x.shape
    assert C % groups == 0
    # lane-pad the group axis to 128 (Mosaic tile constraint); padded
    # columns are all-zero so they contribute nothing
    Gp = max(128, groups)
    M = np.zeros((C, Gp), np.float32)
    for g in range(groups):
        M[g * (C // groups) : (g + 1) * (C // groups), g] = 1.0

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, groups=groups),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Gp), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x,
        gamma.reshape(1, C).astype(jnp.float32),
        beta.reshape(1, C).astype(jnp.float32),
        scale.reshape(B, 1, C).astype(jnp.float32),
        shift.reshape(B, 1, C).astype(jnp.float32),
        jnp.asarray(M),
    )
    return out


def fused_norm_supported(x: jnp.ndarray, groups: int) -> bool:
    B, T, C = x.shape
    if C % 128 != 0 or C % groups != 0:
        return False
    # one (T, C) f32 slab + copies must fit VMEM
    return T * C * 4 * 3 < 12 * 1024 * 1024
