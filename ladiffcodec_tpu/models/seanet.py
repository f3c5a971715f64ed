"""SEANet encoder / decoder (EnCodec topology), NLC layout.

TPU-native counterpart of reference srcs/modules/seanet.py: init conv(k=7) →
per-ratio [residual blocks + strided downsampling conv(k=2r, s=r), channels
×2] → optional LSTM → final conv to `dimension`; the decoder mirrors it with
transposed convs.  ``hop_length = prod(ratios)`` and the encoder consumes the
ratios reversed (seanet.py:101-104).

The convs carry EnCodec's exact padding semantics (see ops/pad.py), which fix
the bitstream frame count: L audio samples -> ceil(L / hop) latent frames.
"""

from __future__ import annotations

import typing as tp

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import SConv1d, SConvTranspose1d
from ..ops.lstm import SLSTM

Dtype = tp.Any


def _activation(name: str, params: tp.Mapping[str, tp.Any]):
    name = name.lower()
    if name == "elu":
        alpha = float(params.get("alpha", 1.0))
        return lambda x: nn.elu(x, alpha=alpha)
    if name == "relu":
        return nn.relu
    if name == "gelu":
        return nn.gelu
    if name == "tanh":
        return jnp.tanh
    raise ValueError(f"unsupported activation {name}")


class SEANetResnetBlock(nn.Module):
    """Residual block: act→conv(k, dilated)→act→conv(1) over a bottleneck of
    dim//compress channels, plus identity (or 1x1-conv) shortcut.
    Reference: srcs/modules/seanet.py:21-63.
    """

    dim: int
    kernel_sizes: tp.Sequence[int] = (3, 1)
    dilations: tp.Sequence[int] = (1, 1)
    activation: str = "ELU"
    activation_params: tp.Mapping[str, tp.Any] = None  # type: ignore[assignment]
    norm: str = "weight_norm"
    causal: bool = False
    pad_mode: str = "reflect"
    compress: int = 2
    true_skip: bool = True
    dtype: tp.Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = _activation(self.activation, self.activation_params or {"alpha": 1.0})
        hidden = self.dim // self.compress
        h = x
        n = len(self.kernel_sizes)
        for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilations)):
            out_ch = self.dim if i == n - 1 else hidden
            h = act(h)
            h = SConv1d(
                features=out_ch,
                kernel_size=k,
                dilation=d,
                norm=self.norm,
                causal=self.causal,
                pad_mode=self.pad_mode,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"block_{i}",
            )(h)
        if self.true_skip:
            shortcut = x
        else:
            shortcut = SConv1d(
                features=self.dim,
                kernel_size=1,
                norm=self.norm,
                causal=self.causal,
                pad_mode=self.pad_mode,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="shortcut",
            )(x)
        return shortcut + h


class SEANetEncoder(nn.Module):
    """Audio (B, L, channels) -> latent (B, L/hop, dimension).

    Reference: srcs/modules/seanet.py:66-154.  Note the encoder uses
    ``reversed(ratios)`` internally, matching the reference constructor.
    """

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: tp.Sequence[int] = (8, 5, 4, 2)
    activation: str = "ELU"
    activation_params: tp.Mapping[str, tp.Any] = None  # type: ignore[assignment]
    norm: str = "weight_norm"
    final_activation: tp.Optional[str] = None
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = "reflect"
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    dtype: tp.Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = _activation(self.activation, self.activation_params or {"alpha": 1.0})
        down_ratios = list(reversed(list(self.ratios)))
        mult = 1
        common = dict(
            norm=self.norm,
            causal=self.causal,
            pad_mode=self.pad_mode,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        h = SConv1d(
            features=mult * self.n_filters, kernel_size=self.kernel_size, name="init_conv", **common
        )(x)
        for i, ratio in enumerate(down_ratios):
            for j in range(self.n_residual_layers):
                h = SEANetResnetBlock(
                    dim=mult * self.n_filters,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    activation=self.activation,
                    activation_params=self.activation_params,
                    norm=self.norm,
                    causal=self.causal,
                    pad_mode=self.pad_mode,
                    compress=self.compress,
                    true_skip=self.true_skip,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"res_{i}_{j}",
                )(h)
            h = act(h)
            h = SConv1d(
                features=mult * self.n_filters * 2,
                kernel_size=ratio * 2,
                stride=ratio,
                name=f"down_{i}",
                **common,
            )(h)
            mult *= 2
        if self.lstm:
            h = SLSTM(
                dimension=mult * self.n_filters,
                num_layers=self.lstm,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="lstm",
            )(h)
        h = act(h)
        h = SConv1d(
            features=self.dimension,
            kernel_size=self.last_kernel_size,
            name="final_conv",
            **common,
        )(h)
        if self.final_activation is not None:
            h = _activation(self.final_activation, {})(h)
        return h


class SEANetDecoder(nn.Module):
    """Latent (B, T, dimension) -> audio (B, T*hop, channels).

    Reference: srcs/modules/seanet.py:157-248.
    """

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: tp.Sequence[int] = (8, 5, 4, 2)
    activation: str = "ELU"
    activation_params: tp.Mapping[str, tp.Any] = None  # type: ignore[assignment]
    final_activation: tp.Optional[str] = None
    norm: str = "weight_norm"
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = "reflect"
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    trim_right_ratio: float = 1.0
    dtype: tp.Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        act = _activation(self.activation, self.activation_params or {"alpha": 1.0})
        mult = int(2 ** len(self.ratios))
        common = dict(
            norm=self.norm,
            causal=self.causal,
            pad_mode=self.pad_mode,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        h = SConv1d(
            features=mult * self.n_filters, kernel_size=self.kernel_size, name="init_conv", **common
        )(z)
        if self.lstm:
            h = SLSTM(
                dimension=mult * self.n_filters,
                num_layers=self.lstm,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="lstm",
            )(h)
        for i, ratio in enumerate(self.ratios):
            h = act(h)
            h = SConvTranspose1d(
                features=mult * self.n_filters // 2,
                kernel_size=ratio * 2,
                stride=ratio,
                norm=self.norm,
                causal=self.causal,
                trim_right_ratio=self.trim_right_ratio,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"up_{i}",
            )(h)
            for j in range(self.n_residual_layers):
                h = SEANetResnetBlock(
                    dim=mult * self.n_filters // 2,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    activation=self.activation,
                    activation_params=self.activation_params,
                    norm=self.norm,
                    causal=self.causal,
                    pad_mode=self.pad_mode,
                    compress=self.compress,
                    true_skip=self.true_skip,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"res_{i}_{j}",
                )(h)
            mult //= 2
        h = act(h)
        h = SConv1d(
            features=self.channels,
            kernel_size=self.last_kernel_size,
            name="final_conv",
            **common,
        )(h)
        if self.final_activation is not None:
            h = _activation(self.final_activation, {})(h)
        return h
