"""Pallas nearest-code kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from ladiffcodec_tpu.ops.pallas_vq import nearest_code_pallas, pallas_supported
from ladiffcodec_tpu.quantization.core import quantize_stage


def test_pallas_nearest_code_matches_xla():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (300, 128))  # N not a tile multiple: exercises padding
    embed = jax.random.normal(jax.random.PRNGKey(1), (256, 128))
    assert pallas_supported(x, embed)
    ref = quantize_stage(x, embed)
    out = nearest_code_pallas(x, embed, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_gate():
    x = jnp.zeros((10, 100))  # D not lane-aligned
    e = jnp.zeros((64, 100))
    assert not pallas_supported(x, e)
