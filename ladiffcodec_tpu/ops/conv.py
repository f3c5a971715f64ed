"""Streamable 1-D (and 2-D) convolutions with EnCodec padding semantics.

TPU-native counterparts of the reference conv wrappers
(srcs/modules/conv.py:110-274): weight-normalized convs whose causal /
asymmetric "same" padding guarantees any input length round-trips exactly
through strided down/up-sampling.

Design:
  * layout is NLC (batch, time, channels) — lax convs run as
    ('NWC','WIO','NWC'), which XLA tiles straight onto the MXU;
  * weight norm is a reparametrization ``kernel = g * v / ||v||`` computed at
    call time (XLA folds it into the conv when params are frozen, and it is a
    negligible elementwise op during training).  The norm axis matches
    torch's ``weight_norm(dim=0)`` convention so reference checkpoints can be
    converted 1:1: per *output* channel for Conv, per *input* channel for
    ConvTranspose;
  * all padding arithmetic is static (shapes are static under jit).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from .pad import pad1d, unpad1d, sconv1d_paddings, sconvtr1d_unpaddings

Dtype = tp.Any

CONV_NORMALIZATIONS = frozenset(
    ["none", "weight_norm", "spectral_norm", "time_layer_norm", "layer_norm", "time_group_norm"]
)


def _kaiming_uniform_conv(fan_in: int):
    """torch Conv default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def weight_normed(v: jnp.ndarray, g: jnp.ndarray, norm_axes: tuple[int, ...]) -> jnp.ndarray:
    """kernel = g * v / ||v||, norm taken over ``norm_axes``."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=norm_axes, keepdims=True))
    return v * (g / jnp.maximum(norm, 1e-12))


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def spectral_normed(mod: nn.Module, kernel: jnp.ndarray, perm: tuple[int, ...]) -> jnp.ndarray:
    """kernel / sigma_max with torch ``nn.utils.spectral_norm`` semantics
    (reference conv.py:27-37 selects it for ``norm='spectral_norm'``).

    ``perm`` reorders our kernel layout into the torch weight layout whose
    leading axis is torch's ``dim=0``; the matrix view flattens the rest in
    that order, so converted torch ``weight_orig``/``_u``/``_v`` buffers drop
    in unchanged.  Persistent u/v live in the "spectral" collection.  One
    power-iteration step runs per call *when that collection is mutable*
    (training steps pass ``mutable=["spectral"]``), matching torch's
    training-mode update; otherwise the stored vectors are used as-is.
    """
    w = jnp.transpose(kernel, perm).astype(jnp.float32)
    rows = w.shape[0]
    w2 = w.reshape(rows, -1)
    cols = w2.shape[1]
    u_var = mod.variable(
        "spectral", "u",
        lambda: _l2_normalize(jax.random.normal(mod.make_rng("params"), (rows,))),
    )
    v_var = mod.variable(
        "spectral", "v",
        lambda: _l2_normalize(jax.random.normal(mod.make_rng("params"), (cols,))),
    )
    u, v = u_var.value, v_var.value
    if mod.is_mutable_collection("spectral") and not mod.is_initializing():
        v = _l2_normalize(w2.T @ u)
        u = _l2_normalize(w2 @ v)
        u_var.value = jax.lax.stop_gradient(u)
        v_var.value = jax.lax.stop_gradient(v)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (w2 @ v)
    return kernel / sigma.astype(kernel.dtype)


class NormConv1d(nn.Module):
    """Conv1d (VALID padding — callers pad) + parametrization/module norm.

    Input/output: (B, L, C).  Reference: srcs/modules/conv.py:130-144.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    causal: bool = False
    norm: str = "none"
    norm_kwargs: tp.Mapping[str, tp.Any] = None  # type: ignore[assignment]
    dtype: tp.Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.norm in CONV_NORMALIZATIONS
        in_ch = x.shape[-1]
        assert in_ch % self.groups == 0
        kshape = (self.kernel_size, in_ch // self.groups, self.features)
        fan_in = (in_ch // self.groups) * self.kernel_size
        init = _kaiming_uniform_conv(fan_in)

        if self.norm == "weight_norm":
            v = self.param("kernel_v", init, kshape, self.param_dtype)
            # g initialized to ||v|| exactly (torch weight_norm), so the
            # effective kernel at init equals v.
            g = self.param(
                "kernel_g",
                lambda key, shape, dt: jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True)
                ).astype(dt),
                (1, 1, self.features),
                self.param_dtype,
            )
            kernel = weight_normed(v, g, (0, 1))
        elif self.norm == "spectral_norm":
            w = self.param("kernel", init, kshape, self.param_dtype)
            # torch Conv1d weight is (out, in, k), dim=0 keeps out channels
            kernel = spectral_normed(self, w, (2, 1, 0))
        else:
            kernel = self.param("kernel", init, kshape, self.param_dtype)

        dtype = self.dtype or x.dtype
        kernel = kernel.astype(dtype)
        x = x.astype(dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding="VALID",
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            b = self.param("bias", _kaiming_uniform_conv(fan_in), (self.features,), self.param_dtype)
            y = y + b.astype(dtype)

        if self.norm == "time_group_norm":
            if self.causal:
                raise ValueError("GroupNorm doesn't support causal evaluation.")
            y = nn.GroupNorm(num_groups=1, dtype=dtype, **(self.norm_kwargs or {}))(y)
        elif self.norm == "layer_norm":
            y = nn.LayerNorm(dtype=dtype, **(self.norm_kwargs or {}))(y)
        return y


class NormConvTranspose1d(nn.Module):
    """ConvTranspose1d (no implicit trimming — callers unpad) + norm.

    Input/output: (B, L, C).  The kernel is stored (K, in, out), matching the
    torch ConvTranspose1d (in, out, K) layout transposed, so torch weight_norm
    dim=0 (= per input channel) maps to norm axes (0, 2).
    Reference: srcs/modules/conv.py:164-178.
    """

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    causal: bool = False
    norm: str = "none"
    norm_kwargs: tp.Mapping[str, tp.Any] = None  # type: ignore[assignment]
    dtype: tp.Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.norm in CONV_NORMALIZATIONS
        in_ch = x.shape[-1]
        kshape = (self.kernel_size, in_ch, self.features)
        # torch ConvTranspose default init uses fan_in = out_ch * k // groups
        fan_in = self.features * self.kernel_size
        init = _kaiming_uniform_conv(fan_in)

        if self.norm == "weight_norm":
            v = self.param("kernel_v", init, kshape, self.param_dtype)
            g = self.param(
                "kernel_g",
                lambda key, shape, dt: jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=(0, 2), keepdims=True)
                ).astype(dt),
                (1, in_ch, 1),
                self.param_dtype,
            )
            kernel = weight_normed(v, g, (0, 2))
        elif self.norm == "spectral_norm":
            w = self.param("kernel", init, kshape, self.param_dtype)
            # torch ConvTranspose1d weight is (in, out, k), dim=0 keeps in
            kernel = spectral_normed(self, w, (1, 2, 0))
        else:
            kernel = self.param("kernel", init, kshape, self.param_dtype)

        dtype = self.dtype or x.dtype
        kernel = kernel.astype(dtype)
        x = x.astype(dtype)
        # Adjoint of a VALID strided correlation: dilate the input by the
        # stride, convolve with the time-flipped kernel, full padding.  This
        # matches torch ConvTranspose1d(padding=0) exactly:
        #   out_len = (L - 1) * stride + K.
        k = self.kernel_size
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=0),
            window_strides=(1,),
            padding=[(k - 1, k - 1)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            b = self.param("bias", _kaiming_uniform_conv(fan_in), (self.features,), self.param_dtype)
            y = y + b.astype(dtype)

        if self.norm == "time_group_norm":
            if self.causal:
                raise ValueError("GroupNorm doesn't support causal evaluation.")
            y = nn.GroupNorm(num_groups=1, dtype=dtype, **(self.norm_kwargs or {}))(y)
        elif self.norm == "layer_norm":
            y = nn.LayerNorm(dtype=dtype, **(self.norm_kwargs or {}))(y)
        return y


class SConv1d(nn.Module):
    """Conv1d with built-in causal / asymmetric-same padding.

    Reference: srcs/modules/conv.py:197-232.  Input/output (B, L, C).
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    causal: bool = False
    norm: str = "none"
    norm_kwargs: tp.Mapping[str, tp.Any] = None  # type: ignore[assignment]
    pad_mode: str = "reflect"
    dtype: tp.Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        left, right = sconv1d_paddings(
            x.shape[-2], self.kernel_size, self.stride, self.dilation, self.causal
        )
        x = pad1d(x, (left, right), mode=self.pad_mode, axis=-2)
        return NormConv1d(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            groups=self.groups,
            use_bias=self.use_bias,
            causal=self.causal,
            norm=self.norm,
            norm_kwargs=self.norm_kwargs,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class SConvTranspose1d(nn.Module):
    """ConvTranspose1d with built-in causal / asymmetric trimming.

    Reference: srcs/modules/conv.py:235-274.  Input/output (B, L, C).
    """

    features: int
    kernel_size: int
    stride: int = 1
    causal: bool = False
    norm: str = "none"
    trim_right_ratio: float = 1.0
    norm_kwargs: tp.Mapping[str, tp.Any] = None  # type: ignore[assignment]
    dtype: tp.Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.causal or self.trim_right_ratio == 1.0
        y = NormConvTranspose1d(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            causal=self.causal,
            norm=self.norm,
            norm_kwargs=self.norm_kwargs,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="convtr",
        )(x)
        left, right = sconvtr1d_unpaddings(
            self.kernel_size, self.stride, self.causal, self.trim_right_ratio
        )
        return unpad1d(y, (left, right), axis=-2)


class NormConv2d(nn.Module):
    """Conv2d + weight norm, NHWC layout, explicit symmetric padding.

    Used by the MS-STFT discriminator (reference srcs/modules/conv.py:147-161,
    srcs/msstftd.py:70-87).
    """

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    dilation: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    norm: str = "none"
    dtype: tp.Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kshape = (kh, kw, in_ch, self.features)
        fan_in = in_ch * kh * kw
        init = _kaiming_uniform_conv(fan_in)

        if self.norm == "weight_norm":
            v = self.param("kernel_v", init, kshape, self.param_dtype)
            g = self.param(
                "kernel_g",
                lambda key, shape, dt: jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=(0, 1, 2), keepdims=True)
                ).astype(dt),
                (1, 1, 1, self.features),
                self.param_dtype,
            )
            kernel = weight_normed(v, g, (0, 1, 2))
        elif self.norm == "spectral_norm":
            w = self.param("kernel", init, kshape, self.param_dtype)
            # torch Conv2d weight is (out, in, kh, kw), dim=0 keeps out
            kernel = spectral_normed(self, w, (3, 2, 0, 1))
        else:
            kernel = self.param("kernel", init, kshape, self.param_dtype)

        dtype = self.dtype or x.dtype
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=self.stride,
            padding=[(ph, ph), (pw, pw)],
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", _kaiming_uniform_conv(fan_in), (self.features,), self.param_dtype)
            y = y + b.astype(dtype)
        if self.norm == "time_group_norm":
            y = nn.GroupNorm(num_groups=1, dtype=dtype)(y)
        return y


class NormConvTranspose2d(nn.Module):
    """ConvTranspose2d + norm, NHWC layout (reference srcs/modules/conv.py:181-194).

    Unused by every shipped reference config; present for API completeness.
    torch ConvTranspose2d(padding=0): out = (in - 1) * stride + kernel.
    Kernel stored (kh, kw, in, out); torch weight_norm dim=0 (= per input
    channel) maps to norm axes (0, 1, 3).
    """

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    use_bias: bool = True
    norm: str = "none"
    dtype: tp.Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.norm in CONV_NORMALIZATIONS
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kshape = (kh, kw, in_ch, self.features)
        fan_in = self.features * kh * kw  # torch ConvTranspose fan-in
        init = _kaiming_uniform_conv(fan_in)

        if self.norm == "weight_norm":
            v = self.param("kernel_v", init, kshape, self.param_dtype)
            g = self.param(
                "kernel_g",
                lambda key, shape, dt: jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=(0, 1, 3), keepdims=True)
                ).astype(dt),
                (1, 1, in_ch, 1),
                self.param_dtype,
            )
            kernel = weight_normed(v, g, (0, 1, 3))
        elif self.norm == "spectral_norm":
            w = self.param("kernel", init, kshape, self.param_dtype)
            # torch ConvTranspose2d weight is (in, out, kh, kw), dim=0 keeps in
            kernel = spectral_normed(self, w, (2, 3, 0, 1))
        else:
            kernel = self.param("kernel", init, kshape, self.param_dtype)

        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            jnp.flip(kernel, axis=(0, 1)).astype(dtype),
            window_strides=(1, 1),
            padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
            lhs_dilation=self.stride,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", _kaiming_uniform_conv(fan_in), (self.features,), self.param_dtype)
            y = y + b.astype(dtype)
        if self.norm == "time_group_norm":
            y = nn.GroupNorm(num_groups=1, dtype=dtype)(y)
        return y
