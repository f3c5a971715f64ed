"""Pallas TPU kernel: fused nearest-codebook-entry search for RVQ.

The XLA lowering of the argmin-distance search (quantization/core.py
`quantize_stage`) materializes the (N, bins) logits in HBM and re-reads them
for the argmax — 2·N·bins·4 bytes of HBM traffic.  This kernel keeps the
codebook and the per-tile logits in VMEM: one MXU matmul + argmax per tile,
logits never leave the chip.

Shapes: x (N, D), embed (bins, D); f32.  For the shipped configs
(D=128, bins=1024) the codebook tile is 512 KB — comfortably in VMEM.
Falls back to the XLA path for unpadded/odd shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _kernel(x_ref, e_ref, e2_ref, out_ref):
    x = x_ref[:]  # (TILE_N, D)
    e = e_ref[:]  # (bins, D)
    # -(‖x−e‖²) up to the x² constant: 2·x·eᵀ − ‖e‖²
    logits = 2.0 * jax.lax.dot_general(
        x, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits = logits - e2_ref[:]
    out_ref[:] = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_code_pallas(x: jnp.ndarray, embed: jnp.ndarray, interpret: bool = False):
    """x (N, D), embed (bins, D) -> codes (N,) int32."""
    N, D = x.shape
    bins = embed.shape[0]
    n_pad = (-N) % TILE_N
    xp = jnp.pad(x.astype(jnp.float32), ((0, n_pad), (0, 0)))
    e2 = jnp.sum(embed.astype(jnp.float32) ** 2, axis=-1)[None, :]  # (1, bins)

    grid = (xp.shape[0] // TILE_N,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], 1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bins, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, embed.astype(jnp.float32), e2)
    return out[:N, 0]


def pallas_supported(x: jnp.ndarray, embed: jnp.ndarray) -> bool:
    """Conservative gate: lane-aligned shapes on a TPU-like backend."""
    N, D = x.shape
    bins = embed.shape[0]
    if D % 128 != 0 or bins % 128 != 0:
        return False
    # codebook + logits tile must fit VMEM comfortably
    vmem_bytes = bins * D * 4 + TILE_N * (D + bins) * 4
    return vmem_bytes < 8 * 1024 * 1024
