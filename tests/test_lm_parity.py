"""Streaming transformer + LM parity vs the reference torch implementation
(srcs/modules/transformer_encodec.py), with converted packed-MHA weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ref_shim import _load, REF
from ladiffcodec_tpu.utils import torch_convert as tc
from ladiffcodec_tpu.models.streaming_transformer import StreamingTransformerEncoder


@pytest.fixture(scope="module")
def ref_enc():
    mod = _load("refenc", f"{REF}/modules", "transformer_encodec")
    torch.manual_seed(0)
    m = mod.StreamingTransformerEncoder(dim=16, num_heads=2, num_layers=2,
                                        past_context=8).eval()
    return m


def sd_np(m):
    return {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}


def test_streaming_transformer_parity_full_pass(ref_enc):
    x = torch.randn(1, 6, 16)
    with torch.no_grad():
        y_ref, states_ref, off_ref = ref_enc(x)

    ours = StreamingTransformerEncoder(dim=16, num_heads=2, num_layers=2, past_context=8)
    params = {"params": tc.streaming_transformer(sd_np(ref_enc), "", num_layers=2)}
    y, states, off = ours.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), rtol=1e-3, atol=3e-4)
    assert int(off) == int(off_ref)


def test_streaming_transformer_parity_stepwise(ref_enc):
    """Chunked streaming with carried state matches the torch streaming."""
    x = torch.randn(1, 6, 16)
    ours = StreamingTransformerEncoder(dim=16, num_heads=2, num_layers=2, past_context=8)
    params = {"params": tc.streaming_transformer(sd_np(ref_enc), "", num_layers=2)}

    with torch.no_grad():
        states_t = None
        off_t = 0
        outs_t = []
        for t in range(6):
            y, states_t, off_t = ref_enc(x[:, t : t + 1], states_t, off_t)
            outs_t.append(y.numpy())

    states_j, off_j = ours.init_state(1)
    outs_j = []
    for t in range(6):
        y, states_j, off_j = ours.apply(
            params, jnp.asarray(x[:, t : t + 1].numpy()), states_j, off_j
        )
        outs_j.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(outs_j, 1), np.concatenate(outs_t, 1), rtol=1e-3, atol=3e-4
    )
