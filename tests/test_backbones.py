"""TransformerDDPM / UNet2D backbones + labml DenoiseDiffusion process."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ladiffcodec_tpu.models.transformer import TransformerDDPM, transformer_positional_encoding
from ladiffcodec_tpu.models.unet2d import UNet2D
from ladiffcodec_tpu.diffusion.lab import DenoiseDiffusion

pytestmark = pytest.mark.slow  # compile-heavy; excluded from `pytest -m 'not slow'`


def test_positional_encoding_shape():
    e = transformer_positional_encoding(10, 32)
    assert e.shape == (10, 32)
    np.testing.assert_allclose(np.asarray(e[0, :16]), 0.0, atol=1e-6)


def test_transformer_ddpm_shapes():
    m = TransformerDDPM(rep_dims=8, emb_dims=16, mlp_dims=32, num_layers=2, num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 8))
    t = jnp.array([3, 5])
    p = m.init(jax.random.PRNGKey(1), x, t)
    y = m.apply(p, x, t)
    assert y.shape == x.shape
    # with condition: channel concat doubles input dims
    m2 = TransformerDDPM(rep_dims=8, emb_dims=16, mlp_dims=32, num_layers=2,
                         num_heads=2, qtz_condition=True)
    p2 = m2.init(jax.random.PRNGKey(1), x, t, x)
    y2 = m2.apply(p2, x, t, x)
    assert y2.shape == x.shape


def test_unet2d_shapes():
    m = UNet2D(inp_channels=1, n_channels=8, ch_mults=(1, 2), is_attn=(False, True))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32))  # (B, T, C_rep)
    t = jnp.array([7])
    p = m.init(jax.random.PRNGKey(1), x, t)
    y = m.apply(p, x, t)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_denoise_diffusion_roundtrip_and_loss():
    dd = DenoiseDiffusion.create(100)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([10, 60])
    xt = dd.q_sample(x0, t, eps)
    rec = dd.predict_start(xt, t, eps)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-4)

    model = lambda x, tt: 0.1 * x
    mse, px0, noise, eps_theta, xt_, t_ = dd.loss(model, x0, jax.random.PRNGKey(2))
    assert np.isfinite(float(mse))
    out = dd.sample_loop(model, (1, 8, 4), jax.random.PRNGKey(3), t_start=20)
    assert out.shape == (1, 8, 4)


def test_diff_rep_unet2d_and_transformer_paths():
    from ladiffcodec_tpu.models.diff_rep import DiffAudioRep

    for mtype in ["unet2d", "transformer"]:
        m = DiffAudioRep(
            rep_dims=16, diff_dims=16, emb_dims=16, n_filters=4, lstm=0,
            enc_ratios=(8,), run_diff=True, model_type=mtype, scaling_global=True,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 1)) * 0.1
        v = m.init(jax.random.PRNGKey(1), x)
        losses, aux = m.apply(v, x, key=jax.random.PRNGKey(2))
        assert list(losses.keys()) == ["diff_loss", "neg_loss"], mtype
        assert aux["x_hat"].shape == x.shape
