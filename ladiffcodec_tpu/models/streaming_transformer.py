"""Streaming (bounded-past-context) transformer encoder + the EnCodec LM.

TPU-native counterpart of reference srcs/modules/transformer_encodec.py and
the `LMModel` used for entropy coding (srcs/encodec/.ipynb_checkpoints/
model-checkpoint.py:32-70 — referenced by encodec/model.py:163-183 but
missing from the shipped package, Appendix A #5).

XLA-friendly streaming state: each layer carries a FIXED-SIZE
(B, past_context, C) key/value history ring plus the global offset, so the
per-step LM call compiles once and never reallocates — the torch version
grows and re-slices a python list of tensors every step.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn


def create_sin_embedding(positions: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """(..., 1) positions -> (..., dim); cos half then sin half (reference
    transformer_encodec.py:16-27)."""
    assert dim % 2 == 0
    half = dim // 2
    adim = jnp.arange(half).reshape(1, 1, -1)
    phase = positions / (max_period ** (adim / (half - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


class StreamingMHA(nn.Module):
    """Self-attention where keys/values are [past ; current] with the
    bounded-context causal mask (reference transformer_encodec.py:44-59)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, x_past, past_context: int, offset):
        B, T, C = x.shape
        H = x_past.shape[1]
        D = C // self.num_heads

        qkv_kernel = lambda feats, name: nn.Dense(feats, name=name)
        q = qkv_kernel(C, "q")(x)
        keys_in = jnp.concatenate([x_past, x], axis=1)
        k = qkv_kernel(C, "k")(keys_in)
        v = qkv_kernel(C, "v")(keys_in)

        def split(u):
            return u.reshape(B, -1, self.num_heads, D).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))
        # absolute positions: queries at offset..offset+T-1; the H history
        # slots end at offset-1 (ring: slot j holds position offset-H+j).
        q_pos = offset + jnp.arange(T).reshape(-1, 1)
        k_pos = jnp.concatenate(
            [offset - H + jnp.arange(H), offset + jnp.arange(T)]
        ).reshape(1, -1)
        delta = q_pos - k_pos
        # k_pos >= -1: the reference initializes the stream state with ONE
        # zero frame that IS attended until it rolls out of the context
        # window (transformer_encodec.py:105 `torch.zeros_like(x[:, :1])`);
        # our ring holds zeros at negative positions, so admitting exactly
        # position -1 reproduces that semantics bit-for-bit.
        valid = (delta >= 0) & (delta <= past_context) & (k_pos >= -1)

        sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        sim = sim * (D ** -0.5)
        sim = jnp.where(valid[None, None], sim, -1e30)
        attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C).astype(x.dtype)
        return nn.Dense(C, name="out")(out)


class StreamingTransformerEncoderLayer(nn.Module):
    """Transformer layer with streaming SA (reference
    transformer_encodec.py:30-41).  The reference builds torch
    `nn.TransformerEncoderLayer` WITHOUT norm_first, so the default
    POST-norm branch runs: sa_input is the raw x, norms come after the
    residual adds."""

    dim: int
    hidden_dim: int
    num_heads: int
    gelu: bool = True
    norm_first: bool = False

    @nn.compact
    def __call__(self, x, x_past, past_context: int, offset):
        mha = StreamingMHA(self.dim, self.num_heads, name="self_attn")
        ln1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        ln2 = nn.LayerNorm(epsilon=1e-5, name="norm2")

        def ff(h):
            h = nn.Dense(self.hidden_dim, name="linear1")(h)
            h = nn.gelu(h) if self.gelu else nn.relu(h)
            return nn.Dense(self.dim, name="linear2")(h)

        if self.norm_first:
            sa_input = ln1(x)
            x = x + mha(sa_input, x_past, past_context, offset)
            x = x + ff(ln2(x))
        else:
            sa_input = x
            x = ln1(x + mha(sa_input, x_past, past_context, offset))
            x = ln2(x + ff(x))
        return x, sa_input


class StreamingTransformerEncoder(nn.Module):
    """Reference transformer_encodec.py:62-119 with fixed-size ring state.

    State: (num_layers, B, past_context, C) array; `init_state` builds it.
    """

    dim: int
    hidden_scale: float = 4.0
    num_heads: int = 8
    num_layers: int = 5
    max_period: float = 10000.0
    past_context: int = 1000
    gelu: bool = True
    norm_in: bool = True

    def init_state(self, batch: int) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
        state = jnp.zeros((self.num_layers, batch, self.past_context, self.dim), jnp.float32)
        return state, jnp.asarray(0, jnp.int32)

    @nn.compact
    def __call__(self, x, states=None, offset=0):
        B, T, C = x.shape
        if states is None:
            states, offset = self.init_state(B)
        positions = jnp.arange(T).reshape(1, -1, 1) + offset
        pos_emb = create_sin_embedding(positions.astype(jnp.float32), C, self.max_period)

        if self.norm_in:
            x = nn.LayerNorm(epsilon=1e-5, name="norm_in")(x)
        x = x + pos_emb

        hidden = int(self.dim * self.hidden_scale)
        new_states = []
        for i in range(self.num_layers):
            past = states[i]
            x, sa_input = StreamingTransformerEncoderLayer(
                self.dim, hidden, self.num_heads, self.gelu, name=f"layer_{i}"
            )(x, past, self.past_context, offset)
            # roll the fixed ring: append this chunk's pre-norm input, keep
            # the last past_context positions
            upd = jnp.concatenate([past, sa_input], axis=1)[:, -self.past_context :, :]
            new_states.append(upd)
        return x, jnp.stack(new_states), offset + T


class LMModel(nn.Module):
    """Per-codebook next-step probabilities for entropy coding
    (reference model-checkpoint.py:32-70)."""

    n_q: int = 32
    card: int = 1024
    dim: int = 200
    num_layers: int = 5
    past_context: int = 1000

    def setup(self):
        self.transformer = StreamingTransformerEncoder(
            dim=self.dim, num_layers=self.num_layers, past_context=self.past_context
        )
        self.emb = [nn.Embed(self.card + 1, self.dim, name=f"emb_{k}") for k in range(self.n_q)]
        self.linears = [nn.Dense(self.card, name=f"linear_{k}") for k in range(self.n_q)]

    def __call__(self, indices, states=None, offset=0):
        """indices (B, n_q, T), values = 1 + codebook index (0 = missing).
        Returns (probas (B, card, n_q, T), new_states, new_offset)."""
        B, K, T = indices.shape
        inp = sum(self.emb[k](indices[:, k]) for k in range(K))
        out, states, offset = self.transformer(inp, states, offset)
        logits = jnp.stack([self.linears[k](out) for k in range(K)], axis=1)  # (B,K,T,card)
        probas = jax.nn.softmax(logits, axis=-1)
        return jnp.transpose(probas, (0, 3, 1, 2)), states, offset

    def init_state(self, batch: int):
        return (
            jnp.zeros((self.num_layers, batch, self.past_context, self.dim), jnp.float32),
            jnp.asarray(0, jnp.int32),
        )
