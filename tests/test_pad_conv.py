"""Padding arithmetic + streamable conv round-trip contracts.

These pin down the properties that define bitstream frame counts
(reference srcs/modules/conv.py, srcs/modules/seanet.py:251-259).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ladiffcodec_tpu.ops.pad import (
    get_extra_padding_for_conv1d,
    pad1d,
    unpad1d,
    sconv1d_paddings,
    sconvtr1d_unpaddings,
)
from ladiffcodec_tpu.ops.conv import SConv1d, SConvTranspose1d


def torch_ref_extra_padding(length, kernel_size, stride, padding_total):
    import math

    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


@pytest.mark.parametrize("length", [1, 7, 100, 319, 320, 321, 1200])
@pytest.mark.parametrize("k,s", [(7, 1), (16, 8), (10, 5), (8, 4), (4, 2), (3, 1)])
def test_extra_padding_matches_reference_formula(length, k, s):
    pt = k - s  # stride>1 case of (k-1)*d-(s-1) with d=1
    assert get_extra_padding_for_conv1d(length, k, s, pt) == torch_ref_extra_padding(
        length, k, s, pt
    )


def test_pad1d_reflect_short_input():
    # input shorter than pad: reference inserts zeros before reflecting
    x = jnp.arange(3.0).reshape(1, 3, 1)
    y = pad1d(x, (5, 5), mode="reflect")
    assert y.shape == (1, 13, 1)
    # must not contain NaN and be finite
    assert np.isfinite(np.asarray(y)).all()


def test_unpad1d():
    x = jnp.arange(10.0).reshape(1, 10, 1)
    y = unpad1d(x, (2, 3))
    np.testing.assert_array_equal(np.asarray(y)[0, :, 0], np.arange(2.0, 7.0))


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("length", [37, 100, 320, 1200])
@pytest.mark.parametrize("k,s,d", [(7, 1, 1), (3, 1, 2), (16, 8, 1), (4, 2, 1)])
def test_sconv_output_length(causal, length, k, s, d):
    """SConv1d output length must be ceil(L / stride) — the EnCodec contract."""
    x = jnp.ones((2, length, 3))
    m = SConv1d(features=5, kernel_size=k, stride=s, dilation=d, causal=causal, norm="weight_norm")
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, -(-length // s), 5), (y.shape, length, s)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("r", [2, 4, 5, 8])
def test_sconvtr_output_length(causal, r):
    """SConvTranspose1d(k=2r, s=r) must output exactly T*r frames."""
    T = 25
    x = jnp.ones((1, T, 4))
    m = SConvTranspose1d(features=4, kernel_size=2 * r, stride=r, causal=causal)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, T * r, 4)


def test_conv_transpose_adjoint_of_conv():
    """Our transpose conv is the true adjoint of the VALID strided conv."""
    k, s = 8, 4
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (k, 3, 5))  # WIO
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 3))

    def fwd(x):
        return jax.lax.conv_general_dilated(
            x, w, (s,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
        )

    y = fwd(x)
    g = jax.random.normal(jax.random.PRNGKey(3), y.shape)
    # adjoint via vjp
    _, vjp = jax.vjp(fwd, x)
    (gx_ref,) = vjp(g)

    # manual transpose conv as implemented in NormConvTranspose1d:
    # kernel stored (K, in=5, out=3) = w transposed
    wt = jnp.transpose(w, (0, 2, 1))
    gx = jax.lax.conv_general_dilated(
        g,
        jnp.flip(wt, axis=0),
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(s,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    # forward conv with VALID may not cover all of x; adjoint zero-pads the tail
    np.testing.assert_allclose(np.asarray(gx)[:, : gx_ref.shape[1]], np.asarray(gx_ref), rtol=1e-5, atol=1e-5)


def test_weight_norm_unit_scale_at_init():
    """At init, g = ||v|| so the effective kernel equals v (torch behavior)."""
    x = jnp.ones((1, 20, 3))
    m = SConv1d(features=4, kernel_size=3, norm="weight_norm")
    params = m.init(jax.random.PRNGKey(0), x)
    v = params["params"]["conv"]["kernel_v"]
    g = params["params"]["conv"]["kernel_g"]
    norm = jnp.sqrt(jnp.sum(v ** 2, axis=(0, 1), keepdims=True))
    np.testing.assert_allclose(np.asarray(g), np.asarray(norm), rtol=1e-6)


def test_pad_for_conv1d():
    from ladiffcodec_tpu.ops.pad import pad_for_conv1d

    x = jnp.ones((1, 10, 1))
    y = pad_for_conv1d(x, kernel_size=4, stride=3)  # (10-4)/3+1 = 3 frames exact? 10->ideal 2*3+4=10
    assert y.shape[1] == 10
    y = pad_for_conv1d(x, kernel_size=4, stride=4)  # ceil((10-4)/4+1)=3 -> ideal 2*4+4=12
    assert y.shape[1] == 12
