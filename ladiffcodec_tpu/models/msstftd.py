"""Multi-scale STFT discriminator (reference srcs/msstftd.py).

Three sub-discriminators at n_fft 1024/2048/512 (hop 256/512/128); each runs
a complex STFT, stacks real/imag as channels, and applies a 2-D weight-normed
conv stack (k=(3,9), time dilations 1/2/4, stride (1,2) along frequency,
LeakyReLU 0.2), returning logits + 5 feature maps for feature matching.

Layout: NHWC with H=time-frames, W=frequency-bins (the reference rearranges
to b c t w — msstftd.py:94).  Waveform input: (B, L, C) NLC.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import NormConv2d
from ..ops.stft import stft


def get_2d_padding(kernel_size: tp.Tuple[int, int], dilation: tp.Tuple[int, int] = (1, 1)):
    return (
        ((kernel_size[0] - 1) * dilation[0]) // 2,
        ((kernel_size[1] - 1) * dilation[1]) // 2,
    )


class DiscriminatorSTFT(nn.Module):
    """One STFT sub-discriminator (reference msstftd.py:31-100)."""

    filters: int
    in_channels: int = 1
    out_channels: int = 1
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    max_filters: int = 1024
    filters_scale: int = 1
    kernel_size: tp.Tuple[int, int] = (3, 9)
    dilations: tp.Sequence[int] = (1, 2, 4)
    stride: tp.Tuple[int, int] = (1, 2)
    normalized: bool = True
    norm: str = "weight_norm"
    activation_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, L, C) waveform -> (logits NHWC, [5 feature maps])."""
        B, L, C = x.shape
        wav = jnp.swapaxes(x, -1, -2)  # (B, C, L)
        z = stft(wav, self.n_fft, self.hop_length, self.win_length, normalized=self.normalized)
        # (B, C, F, T): real/imag as channels, then NHWC with (T, F) spatial
        z = jnp.concatenate([z.real, z.imag], axis=1)  # (B, 2C, F, T)
        z = jnp.transpose(z, (0, 3, 2, 1))  # (B, T, F, 2C)

        act = lambda v: nn.leaky_relu(v, negative_slope=self.activation_slope)
        fmap = []
        z = NormConv2d(
            self.filters,
            kernel_size=self.kernel_size,
            padding=get_2d_padding(self.kernel_size),
            norm=self.norm,
            name="conv_0",
        )(z)
        z = act(z)
        fmap.append(z)
        in_chs = min(self.filters_scale * self.filters, self.max_filters)
        for i, dilation in enumerate(self.dilations):
            out_chs = min((self.filters_scale ** (i + 1)) * self.filters, self.max_filters)
            z = NormConv2d(
                out_chs,
                kernel_size=self.kernel_size,
                stride=self.stride,
                dilation=(dilation, 1),
                padding=get_2d_padding(self.kernel_size, (dilation, 1)),
                norm=self.norm,
                name=f"conv_{i + 1}",
            )(z)
            z = act(z)
            fmap.append(z)
            in_chs = out_chs
        out_chs = min(
            (self.filters_scale ** (len(self.dilations) + 1)) * self.filters, self.max_filters
        )
        k2 = (self.kernel_size[0], self.kernel_size[0])
        z = NormConv2d(
            out_chs, kernel_size=k2, padding=get_2d_padding(k2), norm=self.norm, name="conv_last"
        )(z)
        z = act(z)
        fmap.append(z)
        logits = NormConv2d(
            self.out_channels, kernel_size=k2, padding=get_2d_padding(k2), norm=self.norm,
            name="conv_post",
        )(z)
        return logits, fmap


class MultiScaleSTFTDiscriminator(nn.Module):
    """Reference msstftd.py:103-133."""

    filters: int
    in_channels: int = 1
    out_channels: int = 1
    n_ffts: tp.Sequence[int] = (1024, 2048, 512)
    hop_lengths: tp.Sequence[int] = (256, 512, 128)
    win_lengths: tp.Sequence[int] = (1024, 2048, 512)

    @property
    def num_discriminators(self) -> int:
        return len(self.n_ffts)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        logits, fmaps = [], []
        for i in range(len(self.n_ffts)):
            logit, fmap = DiscriminatorSTFT(
                filters=self.filters,
                in_channels=self.in_channels,
                out_channels=self.out_channels,
                n_fft=self.n_ffts[i],
                win_length=self.win_lengths[i],
                hop_length=self.hop_lengths[i],
                name=f"disc_{i}",
            )(x)
            logits.append(logit)
            fmaps.append(fmap)
        return logits, fmaps
