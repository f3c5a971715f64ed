"""RVQ contracts: code assignment, round-trips, EMA updates, bandwidth policy,
and cross-replica sync on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ladiffcodec_tpu.quantization import (
    ResidualVectorQuantizer,
    init_rvq_state,
    kmeans_init_state,
    rvq_forward,
    rvq_encode,
    rvq_decode,
    quantize_stage,
)


def test_bandwidth_policy_matches_reference():
    # 1024 bins, 50 Hz frame rate -> 0.5 kbps per quantizer;
    # 1.5 kbps -> 3 codebooks, 3 kbps -> 6 (reference vq.py:86-98, model.py:64-66)
    q = ResidualVectorQuantizer(dimension=128, n_q=8, bins=1024)
    assert q.get_bandwidth_per_quantizer(50.0) == pytest.approx(0.5)
    assert q.get_num_quantizers_for_bandwidth(50.0, 1.5) == 3
    assert q.get_num_quantizers_for_bandwidth(50.0, 3.0) == 6
    assert q.get_num_quantizers_for_bandwidth(50.0, None) == 8


def test_quantize_stage_exact_nearest():
    key = jax.random.PRNGKey(0)
    embed = jax.random.normal(key, (16, 4))
    x = embed[jnp.array([3, 7, 11])] + 0.01
    codes = quantize_stage(x, embed)
    np.testing.assert_array_equal(np.asarray(codes), [3, 7, 11])


def test_encode_decode_roundtrip_after_kmeans():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 64, 8))
    state = init_rvq_state(key, n_q=4, bins=32, dim=8, kmeans_init=True)
    state = kmeans_init_state(jax.random.PRNGKey(1), state, x, n_q=4, num_iters=20)
    codes = rvq_encode(state, x, n_q=4)
    assert codes.shape == (4, 2, 64)
    y = rvq_decode(state, codes)
    assert y.shape == x.shape
    # 4 residual stages on 32 codes should reconstruct decently
    err = float(jnp.mean((x - y) ** 2) / jnp.mean(x ** 2))
    assert err < 0.5, err


def test_training_updates_state_and_ste_gradient():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 32, 8))
    state = init_rvq_state(key, n_q=2, bins=16, dim=8, kmeans_init=True)
    state = kmeans_init_state(jax.random.PRNGKey(1), state, x, n_q=2)

    # fresh batch: EMA stats on the k-means batch itself are a fixed point
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 32, 8))
    out = rvq_forward(state, x, 2, training=True, key=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out.state.cluster_size), np.asarray(state.cluster_size))

    # straight-through: d‖quantized‖²/dx == 2*quantized
    def f(x):
        o = rvq_forward(state, x, 2, training=True, key=jax.random.PRNGKey(2))
        return 0.5 * jnp.sum(o.quantized ** 2), o.quantized

    g, q = jax.grad(f, has_aux=True)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(q), rtol=1e-5)


def test_rvq_facade_result_fields():
    q = ResidualVectorQuantizer(dimension=8, n_q=4, bins=16)
    state = q.init_state(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 40, 8))
    state = q.maybe_kmeans_init(jax.random.PRNGKey(2), state, x)
    res = q(state, x, frame_rate=50.0, bandwidth=None, training=True, key=jax.random.PRNGKey(3))
    assert res.quantized.shape == x.shape
    assert res.codes.shape == (4, 1, 40)
    assert float(res.bandwidth) == pytest.approx(4 * np.log2(16) * 50 / 1000)
    assert res.penalty.shape == ()


def test_dp_psum_sync_makes_replicas_agree():
    """Sharded batch + psum'd EMA stats: all replicas end with identical
    codebooks (SURVEY.md §2.8 TPU-native equivalent)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devs = jax.devices()
    assert len(devs) == 8, "conftest must provide 8 CPU devices"
    mesh = Mesh(np.array(devs), ("dp",))

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 16, 4))
    state = init_rvq_state(key, n_q=2, bins=8, dim=4, kmeans_init=False)

    def step(state, x, axis_name=None):
        # threshold 0 disables expiry (reference core_vq.py:159): replacement
        # sampling is per-shard and would otherwise differ from the
        # full-batch run
        out = rvq_forward(state, x, 2, training=True, key=jax.random.PRNGKey(1),
                          axis_name=axis_name, threshold_ema_dead_code=0.0)
        return out.state

    f = shard_map(
        lambda s, x: step(s, x, axis_name="dp"),
        mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=P(),  # state replicated; identical across replicas by psum
        check_vma=False,
    )
    new_state = f(state, x)
    # compare against the single-device run over the FULL batch: the psum'd
    # statistics must equal the unsharded statistics
    ref_state = step(state, x)
    np.testing.assert_allclose(
        np.asarray(new_state.cluster_size), np.asarray(ref_state.cluster_size), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(new_state.embed), np.asarray(ref_state.embed), rtol=1e-4, atol=1e-5)
