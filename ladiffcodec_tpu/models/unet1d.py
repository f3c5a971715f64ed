"""Conditional 1-D diffusion UNet (ε / x₀ predictor), NLC layout.

TPU-native counterpart of reference srcs/modules/unet.py:250-469:
init conv(k=7) → len(dim_mults) down stages (2 ResnetBlocks with time-FiLM +
linear attention + downsample k=4 s=2) → mid (Resnet, full attention, Resnet)
→ mirrored ups with skip concat → final ResnetBlock → tanh → 1×1 out conv.

Conditioning: the codec latent is upsampled through a stack of transposed
convs to the diffusion grid, max-abs scaled, then channel-concatenated to the
input (reference unet.py:407-430).  `process_cond` is exposed separately so
samplers run it ONCE instead of once per denoise step (the reference re-runs
it inside every model call — unet.py:428).

Attention layout note: both attentions keep tensors (B, H, T, D) and run as
batched einsums on the MXU.
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import SConvTranspose1d, _kaiming_uniform_conv

Dtype = tp.Any


class PlainConv1d(nn.Module):
    """torch-style Conv1d with symmetric zero padding, NLC layout."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: tp.Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size
        init = _kaiming_uniform_conv(fan_in)
        kernel = self.param("kernel", init, (self.kernel_size, in_ch, self.features), self.param_dtype)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            b = self.param("bias", init, (self.features,), self.param_dtype)
            y = y + b.astype(dtype)
        return y


class WeightStandardizedConv1d(nn.Module):
    """Conv with weight standardization (reference unet.py:67-80 — named
    WeightStandardizedConv2d there but is a Conv1d)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    dtype: tp.Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size
        init = _kaiming_uniform_conv(fan_in)
        kernel = self.param("kernel", init, (self.kernel_size, in_ch, self.features), self.param_dtype)
        bias = self.param("bias", init, (self.features,), self.param_dtype)
        dtype = self.dtype or x.dtype
        eps = 1e-5 if dtype == jnp.float32 else 1e-3
        mean = jnp.mean(kernel, axis=(0, 1), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1), keepdims=True)
        w = (kernel - mean) * jax.lax.rsqrt(var + eps)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            w.astype(dtype),
            window_strides=(1,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias.astype(dtype)


class ChanLayerNorm(nn.Module):
    """Per-position LayerNorm over channels with a gain only
    (reference unet.py:82-91)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (self.dim,))
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        # stats in f32 for stability, output in the activation dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + eps) * g
        return out.astype(x.dtype)


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(B,) -> (B, dim).  Reference unet.py:104-116."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half) * (-math.log(10000.0) / (half - 1)))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """Fourier time features with random or learned frequencies
    (reference unet.py:118-135): (B,) -> (B, dim + 1) as [t, sin, cos].

    `is_random=True` keeps the frequencies fixed at their random init
    (torch marks the parameter requires_grad=False; here the gradient is
    stopped, which the optimizer sees as zero update)."""

    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        assert self.dim % 2 == 0
        w = self.param("weights", nn.initializers.normal(1.0), (self.dim // 2,))
        if self.is_random:
            w = jax.lax.stop_gradient(w)
        t = t.astype(jnp.float32)[:, None]
        freqs = t * w[None, :] * (2.0 * math.pi)
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class _GNParams(nn.Module):
    """GroupNorm-compatible parameter holder (same names/shapes as
    nn.GroupNorm) for the fused Pallas path."""

    feats: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.feats,))
        bias = self.param("bias", nn.initializers.zeros, (self.feats,))
        return scale, bias


class Block(nn.Module):
    """WS-conv → GroupNorm → (FiLM) → SiLU (reference unet.py:137-154).

    dtype discipline: GroupNorm and the FiLM multiply stay in the activation
    dtype (bf16 inference) — flax defaults would silently promote everything
    back to f32 after the first norm.

    fused_norm: inference-only Pallas fusion of norm+FiLM+SiLU into one HBM
    read/write (ops/pallas_norm.py); False = plain XLA ops (training path,
    identical params), "interpret" = fused kernel in interpreter mode (CPU
    tests).
    """

    dim_out: int
    groups: int = 8
    fused_norm: tp.Any = False

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = WeightStandardizedConv1d(self.dim_out, 3, padding=1, name="proj")(x)

        if self.fused_norm:
            from ..ops.pallas_norm import fused_groupnorm_film_silu, fused_norm_supported

            if fused_norm_supported(x, self.groups):
                gamma, beta = _GNParams(self.dim_out, name="norm")()
                B, T, C = x.shape
                if scale_shift is not None:
                    sc, sh = scale_shift
                    sc = jnp.broadcast_to(sc, (B, 1, C)).reshape(B, C)
                    sh = jnp.broadcast_to(sh, (B, 1, C)).reshape(B, C)
                else:
                    sc = jnp.zeros((B, C), jnp.float32)
                    sh = jnp.zeros((B, C), jnp.float32)
                return fused_groupnorm_film_silu(
                    x, gamma, beta, sc, sh, self.groups,
                    interpret=(self.fused_norm == "interpret"),
                )

        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=x.dtype, name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale.astype(x.dtype) + 1.0) + shift.astype(x.dtype)
        return nn.silu(x)


class ResnetBlock(nn.Module):
    """Two Blocks with time-FiLM + residual 1×1 (reference unet.py:156-192).

    When `use_film` the cond FiLM layers are created for parameter parity
    with the reference, but — exactly as there — the time embedding always
    overwrites the cond scale/shift (unet.py:176-186), so they are inert.
    """

    dim_out: int
    time_emb: bool = True
    groups: int = 8
    use_film: bool = False
    inp_dim: int = 128
    fused_norm: tp.Any = False

    @nn.compact
    def __call__(self, x, t_emb=None, x_cond=None):
        scale_shift = None
        if self.use_film and x_cond is not None:
            scale = nn.Dense(self.dim_out, name="scale_layer")(x_cond)
            shift = nn.Dense(self.dim_out, name="shift_layer")(x_cond)
            scale_shift = (scale, shift)
        if self.time_emb and t_emb is not None:
            h = nn.Dense(self.dim_out * 2, name="mlp")(nn.silu(t_emb))
            h = h[:, None, :]  # (B, 1, 2*dim)
            scale_shift = tuple(jnp.split(h, 2, axis=-1))
        h = Block(self.dim_out, groups=self.groups, fused_norm=self.fused_norm, name="block1")(x, scale_shift)
        h = Block(self.dim_out, groups=self.groups, fused_norm=self.fused_norm, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            res = PlainConv1d(self.dim_out, 1, name="res_conv")(x)
        else:
            res = x
        return h + res


class LinearAttention(nn.Module):
    """Softmax-kernel linear attention (reference unet.py:194-222): O(T·D²).

    `layout="bhtd"`: classic head-major tensors (explicit transposes either
    side of the einsums).  `layout="bthd"`: keeps (B, T, H, D) end to end —
    the head split/merge become free reshapes of contiguous memory and the
    contractions carry the head axis as an einsum batch dim, removing the
    ~10%-of-step copy/transpose cost the round-2 profile attributed to
    attention head reshapes (BASELINE.md).  Same params, same math."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    layout: str = "bhtd"

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = PlainConv1d(hidden * 3, 1, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if self.layout == "bthd":
            split = lambda u: u.reshape(B, T, self.heads, self.dim_head)
            q, k, v = map(split, (q, k, v))  # (B, T, H, D)
            q = jax.nn.softmax(q, axis=-1) * (self.dim_head ** -0.5)
            k = jax.nn.softmax(k, axis=1)  # over T
            ctx = jnp.einsum("bthd,bthe->bhde", k, v, preferred_element_type=jnp.float32)
            out = jnp.einsum("bhde,bthd->bthe", ctx, q,
                             preferred_element_type=jnp.float32)
            out = out.reshape(B, T, hidden).astype(x.dtype)
        else:
            def heads(u):
                return u.reshape(B, T, self.heads, self.dim_head).transpose(0, 2, 1, 3)

            q, k, v = map(heads, (q, k, v))  # (B, H, T, D)
            q = jax.nn.softmax(q, axis=-1) * (self.dim_head ** -0.5)
            k = jax.nn.softmax(k, axis=-2)
            ctx = jnp.einsum("bhtd,bhte->bhde", k, v, preferred_element_type=jnp.float32)
            out = jnp.einsum("bhde,bhtd->bhte", ctx, q, preferred_element_type=jnp.float32)
            out = out.transpose(0, 2, 1, 3).reshape(B, T, hidden).astype(x.dtype)
        out = PlainConv1d(self.dim, 1, name="to_out")(out)
        return ChanLayerNorm(self.dim, name="out_norm")(out)


class Attention(nn.Module):
    """Full attention at the UNet bottleneck, T/2^(stages-1) positions
    (reference unet.py:224-246).  `layout` as in LinearAttention."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    layout: str = "bhtd"

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = PlainConv1d(hidden * 3, 1, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if self.layout == "bthd":
            split = lambda u: u.reshape(B, T, self.heads, self.dim_head)
            q, k, v = map(split, (q, k, v))  # (B, T, H, D)
            q = q * (self.dim_head ** -0.5)
            sim = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhij,bjhd->bihd", attn, v, preferred_element_type=jnp.float32)
            out = out.reshape(B, T, hidden).astype(x.dtype)
        else:
            def heads(u):
                return u.reshape(B, T, self.heads, self.dim_head).transpose(0, 2, 1, 3)

            q, k, v = map(heads, (q, k, v))
            q = q * (self.dim_head ** -0.5)
            sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v, preferred_element_type=jnp.float32)
            out = out.transpose(0, 2, 1, 3).reshape(B, T, hidden).astype(x.dtype)
        return PlainConv1d(self.dim, 1, name="to_out")(out)


class PreNormResidual(nn.Module):
    dim: int
    linear: bool = True
    attn_layout: str = "bthd"

    @nn.compact
    def __call__(self, x):
        h = ChanLayerNorm(self.dim, name="norm")(x)
        if self.linear:
            h = LinearAttention(self.dim, layout=self.attn_layout, name="fn")(h)
        else:
            h = Attention(self.dim, layout=self.attn_layout, name="fn")(h)
        return h + x


def scale_feature_map(x: jnp.ndarray, eps: float = 1e-20):
    """Per-example max-abs over (T, C) (reference unet.py:379-405 — condition
    features always use feature-map scaling)."""
    B = x.shape[0]
    scale = jnp.max(jnp.abs(x.reshape(B, -1)), axis=1)[:, None, None]
    return x / (scale + eps), scale


class CondUpsampler(nn.Module):
    """Transposed-conv stack lifting the codec-rate condition to the
    diffusion grid (reference unet.py:372-377)."""

    cond_channels: int = 128
    upsampling_ratios: tp.Sequence[int] = (5, 4, 2)

    @nn.compact
    def __call__(self, x_cond: jnp.ndarray) -> jnp.ndarray:
        for i, r in enumerate(self.upsampling_ratios):
            x_cond = SConvTranspose1d(
                features=self.cond_channels,
                kernel_size=r * 2,
                stride=r,
                causal=False,
                trim_right_ratio=1.0,
                name=f"layer_{i}",
            )(x_cond)
        return x_cond


class Unet1D(nn.Module):
    """Reference srcs/modules/unet.py:250-469.  Input (B, T, inp_channels)
    (+ cond (B, T_code, cond_channels) at codec rate).

    `method="process_cond"` runs only the condition pipeline; samplers use it
    once per utterance and then call with `cond_processed=True`.
    """

    dim: int
    init_dim: tp.Optional[int] = None
    out_dim: tp.Optional[int] = None
    dim_mults: tp.Sequence[int] = (1, 2, 4, 8)
    inp_channels: int = 3
    self_condition: bool = False
    resnet_block_groups: int = 8
    learned_variance: bool = False
    qtz_condition: bool = False
    other_cond: bool = False
    use_film: bool = False
    cond_global: float = 1.0
    cond_channels: int = 128
    unet_scale_x: bool = False
    unet_scale_cond: bool = True
    upsampling_ratios: tp.Optional[tp.Sequence[int]] = (5, 4, 2)
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    fused_norm: tp.Any = False  # inference-only Pallas norm fusion
    attn_layout: str = "bthd"  # transpose-free default; "bhtd" = head-major legacy

    @property
    def channels(self) -> int:
        return self.inp_channels

    def setup(self):
        # in setup (not compact) so `process_cond` is independently callable
        # via apply(..., method="process_cond")
        if self.other_cond and self.upsampling_ratios is not None:
            self.cond_upsampler = CondUpsampler(
                cond_channels=self.cond_channels,
                upsampling_ratios=tuple(self.upsampling_ratios),
            )

    def process_cond(self, x_cond: jnp.ndarray) -> jnp.ndarray:
        """Upsample + max-abs scale the condition (reference unet.py:407-420)."""
        if self.other_cond and self.upsampling_ratios is not None:
            x_cond = self.cond_upsampler(x_cond)
        if self.unet_scale_cond:
            x_cond, _ = scale_feature_map(x_cond)
        return x_cond

    @nn.compact
    def __call__(self, x, time, x_cond=None, cond_processed: bool = False):
        """x: (B, T, C_in); time: (B,); x_cond: (B, T_code, C_cond) or
        pre-processed (B, T, C_cond) with cond_processed=True."""
        if self.self_condition:
            c = x_cond if x_cond is not None else jnp.zeros_like(x)
            x = jnp.concatenate([c, x], axis=-1)
            x_cond = None
        elif x_cond is not None:
            if not cond_processed:
                x_cond = self.process_cond(x_cond)
            if not self.use_film:
                x = jnp.concatenate([x_cond, x], axis=-1)
            if self.unet_scale_x:
                x, _ = scale_feature_map(x)

        dim = self.dim
        init_dim = self.init_dim or dim
        dims = [init_dim] + [dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        groups = self.resnet_block_groups

        x = PlainConv1d(init_dim, 7, padding=3, name="init_conv")(x)
        r = x

        if self.learned_sinusoidal_cond or self.random_fourier_features:
            t = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim,
                is_random=self.random_fourier_features,
                name="sinu_pos_emb",
            )(time)
        else:
            t = sinusoidal_pos_emb(time, dim)
        t = nn.Dense(dim * 4, name="time_mlp_1")(t)
        t = nn.Dense(dim * 4, name="time_mlp_2")(nn.gelu(t))

        h = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= len(in_out) - 1
            x = ResnetBlock(dim_in, groups=groups, fused_norm=self.fused_norm, name=f"down_{ind}_block1")(x, t)
            h.append(x)
            x = ResnetBlock(
                dim_in,
                groups=groups,
                use_film=self.use_film,
                inp_dim=self.inp_channels,
                fused_norm=self.fused_norm,
                name=f"down_{ind}_block2",
            )(x, t, x_cond)
            x = PreNormResidual(dim_in, linear=True, attn_layout=self.attn_layout, name=f"down_{ind}_attn")(x)
            h.append(x)
            if not is_last:
                x = PlainConv1d(dim_out, 4, stride=2, padding=1, name=f"down_{ind}_downsample")(x)
            else:
                x = PlainConv1d(dim_out, 3, padding=1, name=f"down_{ind}_conv")(x)

        mid_dim = dims[-1]
        x = ResnetBlock(mid_dim, groups=groups, fused_norm=self.fused_norm, name="mid_block1")(x, t)
        x = PreNormResidual(mid_dim, linear=False, attn_layout=self.attn_layout, name="mid_attn")(x)
        x = ResnetBlock(mid_dim, groups=groups, fused_norm=self.fused_norm, name="mid_block2")(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = ResnetBlock(dim_out, groups=groups, fused_norm=self.fused_norm, name=f"up_{ind}_block1")(x, t)
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = ResnetBlock(
                dim_out, groups=groups, use_film=self.use_film,
                fused_norm=self.fused_norm, name=f"up_{ind}_block2"
            )(x, t, x_cond)
            x = PreNormResidual(dim_out, linear=True, attn_layout=self.attn_layout, name=f"up_{ind}_attn")(x)
            if not is_last:
                x = jnp.repeat(x, 2, axis=1)  # nearest-neighbor 2x upsample
            x = PlainConv1d(dim_in, 3, padding=1, name=f"up_{ind}_upsample")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(dim, groups=groups, fused_norm=self.fused_norm, name="final_res_block")(x, t)
        x = jnp.tanh(x)
        out_ch = self.out_dim or self.inp_channels * (1 if not self.learned_variance else 2)
        return PlainConv1d(out_ch, 1, name="final_conv")(x)
