"""Multi-layer LSTM over NLC tensors as a `lax.scan`.

TPU-native counterpart of the reference `SLSTM` (srcs/modules/lstm.py:12-28):
a 2-layer LSTM with a residual skip over the whole stack.

Performance notes:
  * the input projection ``x @ W_ih^T + b`` for ALL timesteps is hoisted out
    of the scan as one large (B*L, C) x (C, 4H) matmul that XLA tiles onto
    the MXU; only the recurrent ``h @ W_hh^T`` (B, H) x (H, 4H) matmul stays
    inside the scan;
  * gate order is torch's (i, f, g, o) so converted checkpoints map 1:1.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = tp.Any


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LSTMLayer(nn.Module):
    """One LSTM layer, input (B, L, C) -> (B, L, H)."""

    hidden: int
    dtype: tp.Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, L, C = x.shape
        H = self.hidden
        bound = 1.0 / (H ** 0.5)
        init = _uniform_init(bound)
        w_ih = self.param("w_ih", init, (C, 4 * H), self.param_dtype)  # torch (4H, C)^T
        w_hh = self.param("w_hh", init, (H, 4 * H), self.param_dtype)  # torch (4H, H)^T
        b_ih = self.param("b_ih", init, (4 * H,), self.param_dtype)
        b_hh = self.param("b_hh", init, (4 * H,), self.param_dtype)

        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        # one big MXU matmul for the whole sequence
        xg = jnp.einsum(
            "blc,cg->blg", x, w_ih.astype(dtype), preferred_element_type=jnp.float32
        ) + (b_ih + b_hh).astype(jnp.float32)
        xg = jnp.swapaxes(xg, 0, 1)  # (L, B, 4H) scan over time

        w_hh_t = w_hh.astype(dtype)

        def step(carry, gates_x):
            h, c = carry
            gates = gates_x + jnp.dot(
                h.astype(dtype), w_hh_t, preferred_element_type=jnp.float32
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((B, H), jnp.float32)
        c0 = jnp.zeros((B, H), jnp.float32)
        _, ys = jax.lax.scan(step, (h0, c0), xg)
        return jnp.swapaxes(ys, 0, 1).astype(dtype)  # (B, L, H)


class SLSTM(nn.Module):
    """num_layers-deep LSTM with residual skip (reference srcs/modules/lstm.py)."""

    dimension: int
    num_layers: int = 2
    skip: bool = True
    dtype: tp.Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x
        for i in range(self.num_layers):
            y = LSTMLayer(
                hidden=self.dimension,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(y)
        if self.skip:
            y = y + x
        return y
