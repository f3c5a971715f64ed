"""torch_export must be the exact inverse of torch_convert: exporting our
variables to a reference-layout state_dict and converting back must
reproduce the original tree bit-for-bit."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ladiffcodec_tpu.utils import torch_convert as tc
from ladiffcodec_tpu.utils import torch_export as te


def tree_equal(a, b, path=""):
    assert type(a) is type(b) or (isinstance(a, dict) and isinstance(b, dict)), (
        path, type(a), type(b))
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)


def test_seanet_roundtrip():
    from ladiffcodec_tpu.models.seanet import SEANetEncoder, SEANetDecoder

    ratios = (8, 5, 4, 2)
    enc = SEANetEncoder(channels=1, ratios=ratios, causal=True, lstm=2, n_filters=4)
    dec = SEANetDecoder(channels=1, ratios=ratios, causal=True, lstm=2, n_filters=4)
    x = jnp.zeros((1, 640, 1))
    pe = enc.init(jax.random.PRNGKey(0), x)["params"]
    z = enc.apply({"params": pe}, x)
    pd = dec.init(jax.random.PRNGKey(1), z)["params"]

    sd = te.seanet_encoder(pe, "encoder", ratios, 1, 2)
    back = tc.seanet_encoder(sd, "encoder", ratios, 1, 2)
    tree_equal(jax.tree.map(np.asarray, pe), back)

    sd = te.seanet_decoder(pd, "decoder", ratios, 1, 2)
    back = tc.seanet_decoder(sd, "decoder", ratios, 1, 2)
    tree_equal(jax.tree.map(np.asarray, pd), back)


@pytest.mark.slow  # measured heavyweight (durations top-10); full suite still runs it
def test_unet_roundtrip():
    from ladiffcodec_tpu.models.unet1d import Unet1D

    net = Unet1D(dim=8, dim_mults=(1, 2), inp_channels=8, other_cond=True,
                 cond_channels=8, upsampling_ratios=(2,), unet_scale_cond=True)
    x = jnp.zeros((1, 16, 8))
    c = jnp.zeros((1, 8, 8))
    p = net.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), c)["params"]

    sd = te.unet1d(p, "diff_model", n_stages=2)
    back = tc.unet1d(sd, "diff_model", n_stages=2, upsampling_ratios=(2,))
    tree_equal(jax.tree.map(np.asarray, p), back)


def test_rvq_roundtrip():
    from ladiffcodec_tpu.quantization import init_rvq_state

    st = init_rvq_state(jax.random.PRNGKey(0), n_q=3, bins=16, dim=8,
                        kmeans_init=False)
    st = st.replace(inited=jnp.asarray([True, True, False]))
    sd = te.rvq_state_dict(st, "quantizer")
    back = tc.rvq_state(sd, "quantizer")
    np.testing.assert_array_equal(np.asarray(st.embed), np.asarray(back.embed))
    np.testing.assert_array_equal(np.asarray(st.embed_avg), np.asarray(back.embed_avg))
    np.testing.assert_array_equal(np.asarray(st.cluster_size), np.asarray(back.cluster_size))
    np.testing.assert_array_equal(np.asarray(st.inited), np.asarray(back.inited))
