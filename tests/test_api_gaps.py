"""API-surface gaps closed in round 2 (VERDICT r1 items 3-5): spectral_norm
power iteration, RandomOrLearnedSinusoidalPosEmb, NormConvTranspose2d —
each parity-tested against the torch behavior it mirrors."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ref_shim import reference_modules
from ladiffcodec_tpu.utils import torch_convert as tc


def sd_np(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------- spectral


def _torch_sn_buffers(m):
    # .copy(): torch updates _u/_v IN PLACE during train forwards, and the
    # state_dict numpy views (and zero-copy jnp.asarray of them) would alias
    sd = {k: v.detach().cpu().numpy().copy() for k, v in m.state_dict().items()}
    return sd["weight_orig"], sd["weight_u"], sd["weight_v"]


def test_spectral_norm_conv1d_parity():
    """Eval-mode output and one train-mode power-iteration step both match
    torch.nn.utils.spectral_norm on Conv1d."""
    torch.manual_seed(0)
    m = torch.nn.utils.spectral_norm(torch.nn.Conv1d(4, 6, 5))
    x = torch.randn(2, 4, 40)
    m.train()
    for _ in range(3):  # run a few iterations so u is not at its random init
        m(x)
    m.eval()
    with torch.no_grad():
        y_ref = m(x).numpy()
    w_orig, u, v = _torch_sn_buffers(m)

    from ladiffcodec_tpu.ops.conv import NormConv1d

    ours = NormConv1d(features=6, kernel_size=5, norm="spectral_norm")
    variables = {
        "params": {
            "kernel": jnp.asarray(w_orig.transpose(2, 1, 0)),  # (k, in, out)
            "bias": jnp.asarray(sd_np(m)["bias"]),
        },
        "spectral": {"u": jnp.asarray(u), "v": jnp.asarray(v)},
    }
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    y = ours.apply(variables, xj)  # immutable -> no iteration, like m.eval()
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, rtol=1e-4, atol=1e-5)

    # train mode: torch runs one power iteration inside forward
    m.train()
    with torch.no_grad():
        y_tr = m(x).numpy()
    _, u_ref, v_ref = _torch_sn_buffers(m)
    y2, upd = ours.apply(variables, xj, mutable=["spectral"])
    np.testing.assert_allclose(np.asarray(y2).transpose(0, 2, 1), y_tr, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["spectral"]["u"]), u_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["spectral"]["v"]), v_ref, rtol=1e-5, atol=1e-6)


def test_spectral_norm_conv2d_parity():
    torch.manual_seed(1)
    m = torch.nn.utils.spectral_norm(torch.nn.Conv2d(3, 8, (3, 3)))
    x = torch.randn(2, 3, 12, 16)
    m.train()
    for _ in range(2):
        m(x)
    m.eval()
    with torch.no_grad():
        y_ref = m(x).numpy()
    w_orig, u, v = _torch_sn_buffers(m)

    from ladiffcodec_tpu.ops.conv import NormConv2d

    ours = NormConv2d(features=8, kernel_size=(3, 3), norm="spectral_norm")
    variables = {
        "params": {
            "kernel": jnp.asarray(w_orig.transpose(2, 3, 1, 0)),  # (kh, kw, in, out)
            "bias": jnp.asarray(sd_np(m)["bias"]),
        },
        "spectral": {"u": jnp.asarray(u), "v": jnp.asarray(v)},
    }
    y = ours.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), y_ref, rtol=1e-4, atol=1e-5
    )


def test_spectral_norm_init_and_reference_flag():
    """norm='spectral_norm' must be a real parametrization, not a silent
    fallback: the spectral collection exists and sigma actually rescales."""
    from ladiffcodec_tpu.ops.conv import SConv1d

    m = SConv1d(features=8, kernel_size=7, norm="spectral_norm")
    x = jnp.ones((1, 50, 4))
    variables = m.init(jax.random.PRNGKey(0), x)
    assert "spectral" in variables, "power-iteration state missing"
    y, upd = m.apply(variables, x, mutable=["spectral"])
    # u must move under power iteration
    assert not np.allclose(
        np.asarray(upd["spectral"]["conv"]["u"]),
        np.asarray(variables["spectral"]["conv"]["u"]),
    )


# ----------------------------------------------------- sinusoidal pos emb


@pytest.mark.parametrize("is_random", [False, True])
def test_random_or_learned_posemb_parity(is_random):
    ref = reference_modules()
    torch.manual_seed(2)
    m = ref.unet.RandomOrLearnedSinusoidalPosEmb(16, is_random)
    t = torch.rand(5) * 1000
    with torch.no_grad():
        y_ref = m(t).numpy()

    from ladiffcodec_tpu.models.unet1d import RandomOrLearnedSinusoidalPosEmb

    ours = RandomOrLearnedSinusoidalPosEmb(16, is_random=is_random)
    params = {"params": {"weights": jnp.asarray(m.weights.detach().numpy())}}
    y = ours.apply(params, jnp.asarray(t.numpy()))
    assert y.shape == (5, 17)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-5)


def test_unet1d_learned_sinusoidal_parity():
    """Full Unet1D forward with learned_sinusoidal_cond=True matches the
    reference wiring (time_mlp.0 = posemb, fourier_dim = dim + 1)."""
    ref = reference_modules()
    torch.manual_seed(3)
    m = ref.unet.Unet1D(
        dim=8, dim_mults=(1, 2), inp_channels=4, other_cond=True,
        cond_channels=8, upsampling_ratios=[4], unet_scale_cond=True,
        learned_sinusoidal_cond=True, learned_sinusoidal_dim=12,
    )
    m.eval()
    x = torch.randn(2, 4, 32)
    cond = torch.randn(2, 8, 8)
    t = torch.tensor([3.0, 7.0])
    with torch.no_grad():
        y_ref = m(x, t, x_cond=cond).numpy()

    from ladiffcodec_tpu.models.unet1d import Unet1D

    ours = Unet1D(
        dim=8, dim_mults=(1, 2), inp_channels=4, other_cond=True,
        cond_channels=8, upsampling_ratios=(4,), unet_scale_cond=True,
        learned_sinusoidal_cond=True, learned_sinusoidal_dim=12,
    )
    params = {"params": tc.unet1d(sd_np(m), "", n_stages=2, upsampling_ratios=(4,))}
    y = ours.apply(
        params,
        jnp.asarray(x.numpy().transpose(0, 2, 1)),
        jnp.asarray(t.numpy()),
        x_cond=jnp.asarray(cond.numpy().transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref, rtol=2e-3, atol=2e-4
    )


# ------------------------------------------------------ NormConvTranspose2d


@pytest.mark.parametrize("norm", ["none", "weight_norm"])
def test_norm_convtr2d_parity(norm):
    ref = reference_modules()
    torch.manual_seed(4)
    m = ref.NormConvTranspose2d(3, 5, kernel_size=(4, 4), stride=(2, 2), norm=norm)
    m.eval()
    x = torch.randn(2, 3, 6, 7)
    with torch.no_grad():
        y_ref = m(x).numpy()

    from ladiffcodec_tpu.ops.conv import NormConvTranspose2d

    ours = NormConvTranspose2d(features=5, kernel_size=(4, 4), stride=(2, 2), norm=norm)
    sd = sd_np(m)
    if norm == "weight_norm":
        params = {
            "kernel_v": jnp.asarray(sd["convtr.weight_v"].transpose(2, 3, 0, 1)),
            "kernel_g": jnp.asarray(sd["convtr.weight_g"].transpose(2, 3, 0, 1)),
            "bias": jnp.asarray(sd["convtr.bias"]),
        }
    else:
        params = {
            "kernel": jnp.asarray(sd["convtr.weight"].transpose(2, 3, 0, 1)),
            "bias": jnp.asarray(sd["convtr.bias"]),
        }
    y = ours.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), y_ref, rtol=1e-4, atol=1e-5
    )
