"""EnCodec padding semantics as pure shape arithmetic + jnp ops.

These functions define the bitstream frame counts, so they reproduce the
reference contract exactly (reference: srcs/modules/conv.py:56-107).  All
arithmetic runs on static Python ints (shapes are static under jit), only the
actual padding touches arrays.

Layout note: every function here operates on the TIME axis of an NLC tensor
(axis=-2) or on the last axis when ``axis=-1`` is passed; the reference
operates on torch NCL's last axis.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def conv_output_length(length: int, kernel_size: int, stride: int, dilation: int = 1) -> int:
    """Output length of a VALID conv over an already-padded input."""
    k_eff = (kernel_size - 1) * dilation + 1
    return (length - k_eff) // stride + 1


def get_extra_padding_for_conv1d(
    length: int, kernel_size: int, stride: int, padding_total: int = 0
) -> int:
    """Extra right-padding so the last conv window is full.

    Mirrors reference srcs/modules/conv.py:56-63: ``n_frames`` is computed
    with the *undilated* kernel size and the dilation folded into
    ``padding_total`` by the caller.
    """
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


def sconv1d_paddings(
    length: int, kernel_size: int, stride: int, dilation: int, causal: bool
) -> tuple[int, int]:
    """(left, right) padding used by the streamable conv.

    Reference srcs/modules/conv.py:217-231: ``padding_total =
    (k-1)*dilation - (stride-1)``; causal puts it all on the left, otherwise
    asymmetric split with the larger half left.  ``extra`` always goes right.
    """
    padding_total = (kernel_size - 1) * dilation - (stride - 1)
    extra = get_extra_padding_for_conv1d(length, kernel_size, stride, padding_total)
    if causal:
        return padding_total, extra
    right = padding_total // 2
    left = padding_total - right
    return left, right + extra


def sconvtr1d_unpaddings(
    kernel_size: int, stride: int, causal: bool, trim_right_ratio: float = 1.0
) -> tuple[int, int]:
    """(left, right) trim applied after a transposed conv.

    Reference srcs/modules/conv.py:252-274.
    """
    padding_total = kernel_size - stride
    if causal:
        right = math.ceil(padding_total * trim_right_ratio)
        left = padding_total - right
    else:
        right = padding_total // 2
        left = padding_total - right
    return left, right


def pad1d(
    x: jnp.ndarray,
    paddings: tuple[int, int],
    mode: str = "zero",
    value: float = 0.0,
    axis: int = -2,
) -> jnp.ndarray:
    """Pad along the time axis, with the reference's reflect-on-short-input
    fix (srcs/modules/conv.py:81-98): if the signal is shorter than the
    largest reflect pad, zero-extend it first so reflection is legal, then
    cut the extension back off.
    """
    left, right = paddings
    assert left >= 0 and right >= 0, (left, right)
    axis = axis % x.ndim
    length = x.shape[axis]

    def _pad(arr, lo, hi, m):
        pad_width = [(0, 0)] * arr.ndim
        pad_width[axis] = (lo, hi)
        if m == "zero" or m == "constant":
            return jnp.pad(arr, pad_width, mode="constant", constant_values=value)
        return jnp.pad(arr, pad_width, mode=m)

    if mode == "reflect":
        max_pad = max(left, right)
        extra = 0
        if length <= max_pad:
            extra = max_pad - length + 1
            x = _pad(x, 0, extra, "zero")
        out = _pad(x, left, right, "reflect")
        if extra:
            sl = [slice(None)] * out.ndim
            sl[axis] = slice(0, out.shape[axis] - extra)
            out = out[tuple(sl)]
        return out
    return _pad(x, left, right, "zero" if mode == "zero" else mode)


def unpad1d(x: jnp.ndarray, paddings: tuple[int, int], axis: int = -2) -> jnp.ndarray:
    """Remove padding along the time axis (reference srcs/modules/conv.py:101-107)."""
    left, right = paddings
    assert left >= 0 and right >= 0
    axis = axis % x.ndim
    assert (left + right) <= x.shape[axis]
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(left, x.shape[axis] - right)
    return x[tuple(sl)]


def pad_for_conv1d(
    x: jnp.ndarray, kernel_size: int, stride: int, padding_total: int = 0, axis: int = -2
) -> jnp.ndarray:
    """Right-pad so the last conv window is full (reference
    srcs/modules/conv.py:66-78)."""
    extra = get_extra_padding_for_conv1d(
        x.shape[axis % x.ndim], kernel_size, stride, padding_total
    )
    return pad1d(x, (0, extra), mode="zero", axis=axis)
