"""2-D (labml-style) diffusion UNet for `model_type='unet2d'`.

TPU-native counterpart of reference srcs/modules/unet2d.py:308-418: the
latent is treated as a 1-channel image (B, C_rep, L, 1) in NHWC; GroupNorm
ResBlocks with time FiLM-add, MHA at selected resolutions, strided-conv
down / transposed-conv up.
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn


class TimeEmbedding2D(nn.Module):
    """Sinusoidal t embedding + MLP (reference unet2d.py:44-84); produces
    n_channels dims from an n_channels//4 sinusoidal base."""

    n_channels: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.n_channels // 8
        emb = math.log(10000.0) / (half - 1)
        freqs = jnp.exp(jnp.arange(half) * -emb)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        h = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
        h = nn.Dense(self.n_channels, name="lin1")(h)
        h = nn.Dense(self.n_channels, name="lin2")(nn.swish(h))
        return h


class ResidualBlock2D(nn.Module):
    """GroupNorm→swish→conv ×2 with time-add (reference unet2d.py:86-140)."""

    out_channels: int
    n_groups: int = 32

    @nn.compact
    def __call__(self, x, t):
        # gcd keeps tiny test configs legal; = n_groups for real channel counts
        groups = math.gcd(self.n_groups, x.shape[-1])
        h = nn.swish(nn.GroupNorm(num_groups=groups, name="norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = h + nn.Dense(self.out_channels, name="time_emb")(nn.swish(t))[:, None, None, :]
        g2 = math.gcd(self.n_groups, self.out_channels)
        h = nn.swish(nn.GroupNorm(num_groups=g2, name="norm2")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return h + x


class AttentionBlock2D(nn.Module):
    """MHA over flattened spatial positions (reference unet2d.py:143-208)."""

    n_channels: int
    n_heads: int = 1
    n_groups: int = 32

    @nn.compact
    def __call__(self, x, t=None):
        B, H, W, C = x.shape
        d_k = self.n_channels
        flat = x.reshape(B, H * W, C)
        qkv = nn.Dense(self.n_heads * d_k * 3, name="projection")(flat)
        qkv = qkv.reshape(B, H * W, self.n_heads, 3 * d_k)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jnp.einsum("bihd,bjhd->bijh", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (d_k ** -0.5), axis=2).astype(x.dtype)
        res = jnp.einsum("bijh,bjhd->bihd", attn, v, preferred_element_type=jnp.float32)
        res = res.reshape(B, H * W, self.n_heads * d_k).astype(x.dtype)
        res = nn.Dense(self.n_channels, name="output")(res)
        return (res + flat).reshape(B, H, W, C)


class UNet2D(nn.Module):
    """Reference unet2d.py:308-418.  Input (B, T, C_rep) latent or already
    4-D NHWC; internally (B, C_rep, T, 1) as a 1-channel image."""

    inp_channels: int = 1
    n_channels: int = 64
    ch_mults: tp.Sequence[int] = (1, 2, 2, 4)
    is_attn: tp.Sequence[bool] = (False, False, True, True)
    n_blocks: int = 2
    self_condition: bool = False
    qtz_condition: bool = False

    @property
    def channels(self) -> int:
        return self.inp_channels

    @nn.compact
    def __call__(self, x, t, x_cond=None):
        squeeze_back = False
        if x.ndim == 3:
            # (B, T, C_rep) latent -> (B, C_rep, T, 1) image
            x = jnp.swapaxes(x, 1, 2)[..., None]
            squeeze_back = True

        n_res = len(self.ch_mults)
        t_emb = TimeEmbedding2D(self.n_channels * 4, name="time_emb")(t)
        h_x = nn.Conv(self.n_channels, (3, 3), padding=1, name="image_proj")(x)

        h = [h_x]
        out_ch = in_ch = self.n_channels
        xx = h_x
        for i in range(n_res):
            out_ch = in_ch * self.ch_mults[i]
            for b in range(self.n_blocks):
                xx = ResidualBlock2D(out_ch, name=f"down_{i}_{b}_res")(xx, t_emb)
                if self.is_attn[i]:
                    xx = AttentionBlock2D(out_ch, name=f"down_{i}_{b}_attn")(xx)
                in_ch = out_ch
                h.append(xx)
            if i < n_res - 1:
                xx = nn.Conv(in_ch, (3, 3), strides=(2, 2), padding=1, name=f"down_{i}_ds")(xx)
                h.append(xx)

        xx = ResidualBlock2D(out_ch, name="mid_res1")(xx, t_emb)
        xx = AttentionBlock2D(out_ch, name="mid_attn")(xx)
        xx = ResidualBlock2D(out_ch, name="mid_res2")(xx, t_emb)

        in_ch = out_ch
        for i in reversed(range(n_res)):
            for b in range(self.n_blocks):
                s = h.pop()
                xx = jnp.concatenate([xx, s], axis=-1)
                xx = ResidualBlock2D(in_ch, name=f"up_{i}_{b}_res")(xx, t_emb)
                if self.is_attn[i]:
                    xx = AttentionBlock2D(in_ch, name=f"up_{i}_{b}_attn")(xx)
            s = h.pop()
            out_ch = in_ch // self.ch_mults[i]
            xx = jnp.concatenate([xx, s], axis=-1)
            xx = ResidualBlock2D(out_ch, name=f"up_{i}_final_res")(xx, t_emb)
            if self.is_attn[i]:
                xx = AttentionBlock2D(out_ch, name=f"up_{i}_final_attn")(xx)
            in_ch = out_ch
            if i > 0:
                # SAME padding: out = in*2 exactly (torch ConvTranspose2d
                # (4,4)/(2,2)/pad 1 equivalent)
                xx = nn.ConvTranspose(
                    in_ch, (4, 4), strides=(2, 2), padding="SAME", name=f"up_{i}_us"
                )(xx)

        out = nn.swish(nn.GroupNorm(num_groups=math.gcd(8, xx.shape[-1]), name="norm")(xx))
        out = nn.Conv(self.inp_channels, (3, 3), padding=1, name="final")(out)
        if squeeze_back:
            out = jnp.swapaxes(out[..., 0], 1, 2)  # back to (B, T, C_rep)
        return out
