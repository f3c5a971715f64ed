"""NumPy KV-cache LM engine (bitstream/lm_numpy.py) vs the jax streaming
graph — the two entropy-coding engines must agree to f32 rounding, including
after the ring wraps past the bounded context (reference semantics:
transformer_encodec.py:30-119 + the one attendable zero init frame)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ladiffcodec_tpu.models.streaming_transformer import LMModel
from ladiffcodec_tpu.bitstream.lm_numpy import NumpyLMEngine


@pytest.fixture(scope="module")
def small_lm():
    K, card, dim, layers, H = 3, 32, 16, 2, 8
    lm = LMModel(n_q=K, card=card, dim=dim, num_layers=layers, past_context=H)
    idx = jnp.zeros((1, K, 1), jnp.int32)
    variables = lm.init(jax.random.PRNGKey(0), idx)
    return lm, variables, K, card


def test_numpy_engine_matches_jax_streaming(small_lm):
    lm, variables, K, card = small_lm
    rng = np.random.RandomState(1)
    T = 24  # 3x past_context: exercises ring overwrite + zero-frame rolloff

    eng = NumpyLMEngine(variables["params"], n_q=K, card=card, dim=lm.dim,
                        num_layers=lm.num_layers, past_context=lm.past_context)

    states, offset = lm.init_state(1)
    prev = np.zeros((K,), np.int64)
    for t in range(T):
        probas, states, offset = lm.apply(
            variables, jnp.asarray(prev, jnp.int32).reshape(1, K, 1), states, offset
        )
        p_jax = np.asarray(probas[0, :, :, 0]).T  # (K, card)
        p_np = eng.step(prev)
        np.testing.assert_allclose(p_np, p_jax, rtol=2e-4, atol=2e-5,
                                   err_msg=f"step {t}")
        prev = 1 + rng.randint(0, card - 1, size=(K,))


def test_numpy_engine_reset_restarts_stream(small_lm):
    lm, variables, K, card = small_lm
    eng = NumpyLMEngine(variables["params"], n_q=K, card=card, dim=lm.dim,
                        num_layers=lm.num_layers, past_context=lm.past_context)
    prev = np.zeros((K,), np.int64)
    first = eng.step(prev).copy()
    eng.step(1 + np.arange(K))
    eng.reset()
    again = eng.step(prev)
    np.testing.assert_array_equal(first, again)
