"""Transformer ε-model for `model_type='transformer'` diffusion.

TPU-native counterpart of reference srcs/modules/transformer.py:226-305:
linear in-projection + sinusoidal positions → 6 pre-LN self-attention blocks
→ final LN+Linear → tanh → output LN+Linear.  As in the reference, the
noise-conditioning FiLM blocks are CONSTRUCTED but not called in forward
(transformer.py:295-297 comments them out), so t is unused; their parameters
exist for checkpoint-shape parity.

Deviation (deliberate, documented): the reference feeds (B, T, E) tensors
into torch's `nn.MultiheadAttention` without `batch_first=True`, so torch
silently attends across the BATCH axis per time step.  We implement standard
per-sequence attention over time — the behavior the code plainly intends.
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn


def transformer_positional_encoding(length: int, channels: int) -> jnp.ndarray:
    """(L, C) sinusoidal table (reference transformer.py:57-82)."""
    half = channels // 2
    emb = math.log(10000.0) / float(half - 1)
    freqs = jnp.exp(jnp.arange(half) * -emb)
    args = jnp.arange(length, dtype=jnp.float32)[:, None] * freqs[None, :]
    out = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if channels % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


def noise_encoding(noise: jnp.ndarray, channels: int) -> jnp.ndarray:
    """Sinusoidal noise-level encoding scaled by 5000
    (reference transformer.py:34-55)."""
    half = channels // 2
    emb = math.log(10000.0) / float(half - 1)
    freqs = jnp.exp(jnp.arange(half) * -emb)
    args = 5000.0 * noise.astype(jnp.float32)[:, None] * freqs[None, :]
    out = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if channels % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class DenseFiLM(nn.Module):
    """FiLM generator from the noise level (reference transformer.py:84-125).
    Instantiated for parity; unused by TransformerDDPM.forward."""

    channels: int
    out_channels: int
    sequence: bool = False

    @nn.compact
    def __call__(self, pos: jnp.ndarray, cond: tp.Optional[jnp.ndarray] = None):
        h = noise_encoding(pos.reshape(-1), self.channels)
        h = nn.Dense(self.channels * 4, name="net_1")(h)
        h = nn.Dense(self.channels * 4, name="net_2")(nn.silu(h))
        if self.sequence:
            h = h[:, None, :]
        if cond is not None:
            c = nn.Dense(self.channels * 4, name="cond_1")(cond)
            c = nn.Dense(self.channels * 4, name="cond_2")(nn.silu(c))
            h = h[:, None, :] + c
        scale = nn.Dense(self.out_channels, name="output_scale")(h)
        shift = nn.Dense(self.out_channels, name="output_shift")(h)
        return scale, shift


class DenseResBlock(nn.Module):
    """Fully-connected residual block with featurewise affine
    (reference transformer.py:127-171)."""

    out_dimension: int

    @nn.compact
    def __call__(self, x, scale, shift):
        def affine(v, s, sh):
            if s.ndim != 3:
                s = s[:, None, :]
                sh = sh[:, None, :]
            return s * v + sh

        h = nn.LayerNorm(name="ln")(x)
        h = affine(h, scale, shift)
        h = nn.Dense(self.out_dimension, name="fc1")(nn.silu(h))
        h = nn.LayerNorm(name="ln2")(h)
        h = affine(h, scale, shift)
        h = nn.Dense(self.out_dimension, name="fc2")(nn.silu(h))
        if x.shape[-1] == h.shape[-1]:
            shortcut = x
        else:
            shortcut = nn.Dense(self.out_dimension, name="cmp")(x)
        return h + shortcut


class TransformerEncoderBlock(nn.Module):
    """Pre-LN MHA + MLP block (reference transformer.py:184-206)."""

    emb_dims: int = 128
    mlp_dims: int = 2048
    num_heads: int = 8

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="ln_attn")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.emb_dims, name="mha"
        )(h, h)
        x = x + h
        h = nn.LayerNorm(name="ln_mlp")(x)
        h = nn.Dense(self.mlp_dims, name="fc1")(h)
        h = nn.Dense(self.emb_dims, name="fc2")(nn.gelu(h))
        return x + h


class TransformerDDPM(nn.Module):
    """Reference transformer.py:226-305.  Input/output (B, T, rep_dims)."""

    rep_dims: int = 128
    emb_dims: int = 128
    mlp_dims: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    num_mlp_layers: int = 2
    self_condition: bool = False
    qtz_condition: bool = False

    @property
    def channels(self) -> int:
        return self.rep_dims

    @nn.compact
    def __call__(self, x, t, x_cond=None):
        if self.self_condition:
            c = x_cond if x_cond is not None else jnp.zeros_like(x)
            x = jnp.concatenate([c, x], axis=-1)
        elif x_cond is not None:
            x = jnp.concatenate([x_cond, x], axis=-1)

        B, T, C = x.shape
        temb = transformer_positional_encoding(T, self.emb_dims)[None]
        x = nn.Dense(self.emb_dims, name="first_layer")(x) + temb

        for i in range(self.num_layers):
            x = TransformerEncoderBlock(
                self.emb_dims, self.mlp_dims, self.num_heads, name=f"block_{i}"
            )(x)
        x = nn.LayerNorm(name="enc_ln")(x)
        x = nn.Dense(self.mlp_dims, name="enc_out")(x)

        # noise-cond residual blocks: constructed, not called (reference
        # transformer.py:295-297) — parameters only.
        for i in range(self.num_mlp_layers):
            _film = DenseFiLM(self.mlp_dims, self.mlp_dims, name=f"cond_film_{i}")
            _block = DenseResBlock(self.mlp_dims, name=f"cond_res_{i}")
            if False:  # pragma: no cover — reference keeps these dormant
                scale, shift = _film(t.reshape(-1, 1))
                x = _block(x, scale, shift)

        x = jnp.tanh(x)
        x = nn.LayerNorm(name="out_ln")(x)
        return nn.Dense(self.rep_dims, name="out_proj")(x)
