"""Golden numerical parity: reference torch modules vs our JAX modules with
converted weights.  This is the checkpoint-compatibility contract
(SURVEY.md §7 hard part (b))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ref_shim import reference_modules, reference_quantization
from ladiffcodec_tpu.utils import torch_convert as tc


def sd_np(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("k,s,d", [(7, 1, 1), (16, 8, 1), (3, 1, 2)])
def test_sconv1d_parity(causal, k, s, d):
    ref = reference_modules()
    torch.manual_seed(0)
    m = ref.SConv1d(4, 6, kernel_size=k, stride=s, dilation=d, causal=causal,
                    norm="weight_norm")
    m.eval()
    x = torch.randn(2, 4, 100)
    with torch.no_grad():
        y_ref = m(x).numpy()

    from ladiffcodec_tpu.ops.conv import SConv1d

    ours = SConv1d(features=6, kernel_size=k, stride=s, dilation=d, causal=causal,
                   norm="weight_norm")
    params = {"params": {"conv": tc.conv1d(sd_np(m), "conv.conv")}}
    y = ours.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("r", [2, 5, 8])
def test_sconvtr1d_parity(causal, r):
    ref = reference_modules()
    torch.manual_seed(1)
    m = ref.SConvTranspose1d(4, 3, kernel_size=2 * r, stride=r, causal=causal,
                             norm="weight_norm")
    m.eval()
    x = torch.randn(1, 4, 25)
    with torch.no_grad():
        y_ref = m(x).numpy()

    from ladiffcodec_tpu.ops.conv import SConvTranspose1d

    ours = SConvTranspose1d(features=3, kernel_size=2 * r, stride=r, causal=causal,
                            norm="weight_norm")
    params = {"params": {"convtr": tc.convtr1d(sd_np(m), "convtr.convtr")}}
    y = ours.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, rtol=1e-4, atol=1e-5)


def test_slstm_parity():
    ref = reference_modules()
    torch.manual_seed(2)
    m = ref.SLSTM(8, num_layers=2)
    m.eval()
    x = torch.randn(2, 8, 30)
    with torch.no_grad():
        y_ref = m(x).numpy()

    from ladiffcodec_tpu.ops.lstm import SLSTM

    ours = SLSTM(dimension=8, num_layers=2)
    params = {"params": tc.lstm(sd_np(m), "lstm", 2)}
    y = ours.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("lstm_layers", [0, 2])
def test_seanet_encoder_parity(lstm_layers):
    ref = reference_modules()
    torch.manual_seed(3)
    m = ref.SEANetEncoder(channels=1, dimension=16, n_filters=4, ratios=[8, 5, 4, 2],
                          causal=True, lstm=lstm_layers)
    m.eval()
    x = torch.randn(1, 1, 1600)
    with torch.no_grad():
        y_ref = m(x).numpy()

    from ladiffcodec_tpu.models.seanet import SEANetEncoder

    ours = SEANetEncoder(channels=1, dimension=16, n_filters=4, ratios=(8, 5, 4, 2),
                         causal=True, lstm=lstm_layers)
    params = {
        "params": tc.seanet_encoder(sd_np(m), "", (8, 5, 4, 2), 1, lstm_layers)
    }
    y = ours.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref, rtol=1e-3, atol=1e-4
    )


def test_seanet_decoder_parity():
    ref = reference_modules()
    torch.manual_seed(4)
    m = ref.SEANetDecoder(channels=1, dimension=16, n_filters=4, ratios=[8, 5, 4, 2],
                          causal=True, lstm=2)
    m.eval()
    z = torch.randn(1, 16, 5)
    with torch.no_grad():
        y_ref = m(z).numpy()

    from ladiffcodec_tpu.models.seanet import SEANetDecoder

    ours = SEANetDecoder(channels=1, dimension=16, n_filters=4, ratios=(8, 5, 4, 2),
                         causal=True, lstm=2)
    params = {"params": tc.seanet_decoder(sd_np(m), "", (8, 5, 4, 2), 1, 2)}
    y = ours.apply(params, jnp.asarray(z.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref, rtol=1e-3, atol=1e-4
    )


def test_rvq_encode_decode_parity():
    """Code assignment parity on fixed inputs (SURVEY.md §7 step 3)."""
    refq = reference_quantization()
    torch.manual_seed(5)
    m = refq.vq.ResidualVectorQuantizer(dimension=8, n_q=4, bins=64, kmeans_init=False)
    m.eval()
    x = torch.randn(2, 8, 50)
    with torch.no_grad():
        codes_ref = m.encode(x, sample_rate=50, bandwidth=None).numpy()  # (K, B, T)
        dec_ref = m.decode(torch.from_numpy(codes_ref)).numpy()

    from ladiffcodec_tpu.quantization import rvq_encode, rvq_decode
    state = tc.rvq_state(sd_np(m), "")
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    codes = rvq_encode(state, xj, 4)
    np.testing.assert_array_equal(np.asarray(codes), codes_ref)
    dec = rvq_decode(state, codes)
    np.testing.assert_allclose(
        np.asarray(dec).transpose(0, 2, 1), dec_ref, rtol=1e-4, atol=1e-5
    )


def test_unet1d_parity():
    ref = reference_modules()
    torch.manual_seed(6)
    m = ref.unet.Unet1D(
        dim=16, dim_mults=(1, 2, 2, 4, 4), inp_channels=8, other_cond=True,
        cond_channels=8, upsampling_ratios=[4], unet_scale_cond=True,
    )
    m.eval()
    x = torch.randn(1, 8, 64)
    tt = torch.tensor([17])
    cond = torch.randn(1, 8, 16)
    with torch.no_grad():
        y_ref = m(x, tt, cond).numpy()

    from ladiffcodec_tpu.models.unet1d import Unet1D

    ours = Unet1D(
        dim=16, dim_mults=(1, 2, 2, 4, 4), inp_channels=8, other_cond=True,
        cond_channels=8, upsampling_ratios=(4,), unet_scale_cond=True,
    )
    params = {"params": tc.unet1d(sd_np(m), "", n_stages=5, upsampling_ratios=(4,))}
    y = ours.apply(
        params,
        jnp.asarray(x.numpy().transpose(0, 2, 1)),
        jnp.asarray(tt.numpy()),
        jnp.asarray(cond.numpy().transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref, rtol=2e-3, atol=2e-4
    )
