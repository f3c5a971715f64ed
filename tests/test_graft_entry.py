"""Driver-contract checks: entry() jits on one device; dryrun_multichip runs
a real sharded training step on the 8-device CPU mesh."""

import pytest
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np
pytestmark = pytest.mark.slow  # compile-heavy; excluded from `pytest -m 'not slow'`


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally


def test_entry_compiles_tiny():
    """entry() returns a jittable fn; check a tiny analogue end-to-end (the
    full-size flagship is compile-checked by the driver itself)."""
    import __graft_entry__ as g

    model, cond_model = g._flagship(tiny=True)
    import jax.numpy as jnp

    x = jnp.zeros((1, 640, 1))
    cv = cond_model.init(jax.random.PRNGKey(0), x)
    cond = cond_model.apply(cv, x, method="get_cond")
    v = model.init(jax.random.PRNGKey(1), x, cond=cond)

    @jax.jit
    def fn(v, cv, x, key):
        c = cond_model.apply(cv, x, method="get_cond")
        (losses, aux), _ = model.apply(
            v, x, key=key, cond=c, training=False, mutable=["quantizer"]
        )
        return losses["diff_loss"], aux["x_hat"]

    loss, x_hat = fn(v, cv, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert x_hat.shape == x.shape
