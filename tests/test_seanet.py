"""SEANet shape round-trip tests (reference srcs/modules/seanet.py:251-259)."""

import jax
import jax.numpy as jnp
import pytest

from ladiffcodec_tpu.models.seanet import SEANetEncoder, SEANetDecoder

pytestmark = pytest.mark.slow  # compile-heavy; excluded from `pytest -m 'not slow'`


@pytest.mark.parametrize(
    "ratios,length",
    [
        ((8, 5, 4, 2), 24000),  # reference test(): 24000 -> 75 frames (hop 320)
        ((8, 4), 1216),  # hop-32 continuous AE config
        ((8,), 640),  # hop-8 diffusion-latent config
    ],
)
def test_encoder_decoder_roundtrip_shapes(ratios, length):
    import numpy as np

    hop = int(np.prod(ratios))
    enc = SEANetEncoder(ratios=ratios, causal=True, lstm=2)
    dec = SEANetDecoder(ratios=ratios, causal=True, lstm=2)
    x = jnp.ones((1, length, 1))
    ep = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(ep, x)
    assert z.shape == (1, length // hop, 128), z.shape
    dp = dec.init(jax.random.PRNGKey(1), z)
    y = dec.apply(dp, z)
    assert y.shape == x.shape, (y.shape, x.shape)


def test_encoder_jit_and_grad():
    enc = SEANetEncoder(ratios=(8, 4), causal=True, lstm=0, n_filters=8, dimension=16)
    x = jnp.ones((2, 320, 1))
    params = enc.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loss(p, x):
        return jnp.mean(enc.apply(p, x) ** 2)

    g = jax.grad(loss)(params, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(jnp.all(jnp.isfinite(l)) for l in leaves)
