"""Unet1D shape/conditioning contracts (reference srcs/modules/unet.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ladiffcodec_tpu.models.unet1d import Unet1D, scale_feature_map, sinusoidal_pos_emb


def test_sinusoidal_pos_emb():
    e = sinusoidal_pos_emb(jnp.array([0.0, 5.0]), 64)
    assert e.shape == (2, 64)
    # t=0: sin part zero, cos part one
    np.testing.assert_allclose(np.asarray(e[0, :32]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e[0, 32:]), 1.0, atol=1e-6)


def test_scale_feature_map():
    x = jnp.array([[[3.0, -6.0], [1.0, 2.0]]])
    y, s = scale_feature_map(x)
    assert float(s[0, 0, 0]) == 6.0
    assert float(jnp.max(jnp.abs(y))) == pytest.approx(1.0, rel=1e-5)


@pytest.mark.slow
def test_unet_uncond_smoke():
    """Reference inline test (unet.py:472-480): dims 64, mults (1,2,4,4)."""
    unet = Unet1D(dim=32, dim_mults=(1, 2, 4, 4), inp_channels=3)
    x = jnp.ones((2, 256, 3))
    t = jnp.array([2, 7])
    params = unet.init(jax.random.PRNGKey(0), x, t)
    y = unet.apply(params, x, t)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_unet_flagship_conditioned():
    """Flagship config (model.py:74): mults (1,2,2,4,4), 128-ch latent,
    other_cond with upsampling 4 (ratios [4] lifts hop-32 codec latent to
    hop-8 diffusion latent)."""
    unet = Unet1D(
        dim=16,
        dim_mults=(1, 2, 2, 4, 4),
        inp_channels=8,
        other_cond=True,
        cond_channels=8,
        upsampling_ratios=(4,),
        unet_scale_cond=True,
    )
    T = 64  # divisible by 2^4
    x = jnp.ones((1, T, 8))
    t = jnp.array([5])
    cond = jnp.ones((1, T // 4, 8))
    params = unet.init(jax.random.PRNGKey(0), x, t, cond)
    y = unet.apply(params, x, t, cond)
    assert y.shape == x.shape

    # process_cond standalone must match the fused path
    pc = unet.apply(params, cond, method="process_cond")
    assert pc.shape == (1, T, 8)
    y2 = unet.apply(params, x, t, pc, cond_processed=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=2e-5, atol=2e-5)


def test_unet_film_params_exist():
    unet = Unet1D(
        dim=16,
        dim_mults=(1, 2),
        inp_channels=4,
        other_cond=True,
        cond_channels=4,
        upsampling_ratios=(2,),
        use_film=True,
    )
    x = jnp.ones((1, 16, 4))
    cond = jnp.ones((1, 8, 4))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.array([1]), cond)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(k.key) for k in path) for path, _ in flat}
    assert any("scale_layer" in n for n in names), sorted(names)[:10]


@pytest.mark.slow  # measured heavyweight (durations top-10); full suite still runs it
def test_attn_layout_bthd_matches_bhtd():
    """The transpose-free (B,T,H,D) attention layout is numerically the same
    program as the head-major one (same params, same contractions — only the
    memory movement differs)."""
    kwargs = dict(dim=16, dim_mults=(1, 2), inp_channels=4, other_cond=True,
                  cond_channels=4, upsampling_ratios=(2,))
    a = Unet1D(**kwargs, attn_layout="bhtd")
    b = Unet1D(**kwargs, attn_layout="bthd")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 4))
    t = jnp.array([5, 9])
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4))
    params = a.init(jax.random.PRNGKey(2), x, t, cond)
    ya = a.apply(params, x, t, cond)
    yb = b.apply(params, x, t, cond)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-5, atol=1e-5)


def test_sampler_bf16_chain_close_to_f32():
    """halfway_sampling with a bf16 carry tracks the f32 chain (the
    schedule coefficients follow the carry dtype; quality-bearing decode is
    re-verified on device in BASELINE.md)."""
    from ladiffcodec_tpu.diffusion.gaussian import GaussianDiffusion1D, make_schedule

    diff = GaussianDiffusion1D(schedule=make_schedule(100))
    w = jax.random.normal(jax.random.PRNGKey(0), (8, 8)) * 0.1

    def model_fn(x, t, c):
        return jnp.tanh(x @ w.astype(x.dtype))

    img = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8)) * 0.5
    key = jax.random.PRNGKey(2)
    out32 = diff.halfway_sampling(model_fn, img, 10, key)
    out16 = diff.halfway_sampling(model_fn, img.astype(jnp.bfloat16), 10, key)
    assert out16.dtype == jnp.bfloat16
    # per-step rounding perturbs the injected-noise trajectory, so pointwise
    # agreement decays chaotically; the chains must stay distributionally
    # identical (same operator, same schedule).  End-quality is gated on
    # device (BASELINE.md chain_dtype rows).
    o16 = out16.astype(jnp.float32)
    assert bool(jnp.isfinite(o16).all())
    s32, s16 = float(out32.std()), float(o16.std())
    m32, m16 = float(out32.mean()), float(o16.mean())
    assert abs(s16 - s32) < 0.2 * s32, (s16, s32)
    assert abs(m16 - m32) < 0.2 * s32, (m16, m32)
    # single-step (t=1, no noise draw at t=0) must agree tightly
    one32 = diff.halfway_sampling(model_fn, img, 1, key)
    one16 = diff.halfway_sampling(model_fn, img.astype(jnp.bfloat16), 1, key)
    err = float(jnp.max(jnp.abs(one32 - one16.astype(jnp.float32))))
    assert err < 0.05, err


def test_ddim_bf16_chain_runs_and_tracks_f32():
    """ddim_from with a bf16 carry compiles (its indexed scalar schedule
    coefficients must follow the carry dtype — the perf-matrix run caught a
    f32 promotion breaking the scan carry) and tracks the f32 chain."""
    from ladiffcodec_tpu.diffusion.gaussian import GaussianDiffusion1D, make_schedule

    diff = GaussianDiffusion1D(schedule=make_schedule(100))
    w = jax.random.normal(jax.random.PRNGKey(0), (8, 8)) * 0.1

    def model_fn(x, t, c):
        return jnp.tanh(x @ w.astype(x.dtype))

    img = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8)) * 0.5
    key = jax.random.PRNGKey(2)
    out32 = diff.ddim_from(model_fn, img, 50, 10, key)
    out16 = diff.ddim_from(model_fn, img.astype(jnp.bfloat16), 50, 10, key)
    assert out16.dtype == jnp.bfloat16
    o16 = out16.astype(jnp.float32)
    assert bool(jnp.isfinite(o16).all())
    # eta=0 -> the DDIM chain is deterministic; agreement is rounding-limited
    err = float(jnp.max(jnp.abs(out32 - o16)))
    assert err < 0.08, err
