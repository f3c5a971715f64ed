"""Whole-pipeline parity: reference torch vs this framework with shared
(converted) weights, end to end — cond codec encode -> RVQ -> upsample ->
denoise -> hop-8 decode -> waveform.

`halfway_sampling(t=1)` runs exactly one p_sample at t=0, which adds NO
noise (ddpm_loss.py:249), so the entire pipeline is deterministic and the
waveforms must match to float tolerance.  This is the integration-level
counterpart of the per-module golden tests in test_torch_parity.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ref_shim import reference_modules, reference_quantization, _load, REF
from ladiffcodec_tpu.utils import torch_convert as tc
pytestmark = pytest.mark.slow  # compile-heavy; excluded from `pytest -m 'not slow'`


def sd_np(m):
    return {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}


def test_full_pipeline_parity_one_step():
    ref = reference_modules()
    refq = reference_quantization()
    ddpm = _load("refmod", f"{REF}/losses", "ddpm_loss")

    torch.manual_seed(0)
    L = 1280
    DIM = 16

    # --- reference torch pipeline (srcs/sample.py:125-131 with t=1) ---
    cond_enc_t = ref.SEANetEncoder(channels=1, dimension=DIM, n_filters=4,
                                   ratios=[8, 5, 4, 2], causal=True, lstm=2).eval()
    rvq_t = refq.vq.ResidualVectorQuantizer(dimension=DIM, n_q=3, bins=64,
                                            kmeans_init=False).eval()
    unet_t = ref.unet.Unet1D(dim=16, dim_mults=(1, 2, 2, 4, 4), inp_channels=DIM,
                             other_cond=True, cond_channels=DIM,
                             upsampling_ratios=[5, 4, 2], unet_scale_cond=True).eval()
    dec_t = ref.SEANetDecoder(channels=1, dimension=DIM, n_filters=4, ratios=[8],
                              causal=True, lstm=0).eval()
    gd_t = ddpm.GaussianDiffusion1D(model=unet_t, seq_length=L // 8).eval()

    wav = torch.randn(1, 1, L) * 0.1
    with torch.no_grad():
        c = cond_enc_t(wav)
        q, _, _ = rvq_t.vq(c, n_q=3)
        img = q
        for layer in unet_t.upsampling_layers:
            img = layer(img)
        img = img / (img.abs().max() + 1e-8)
        s_t = gd_t.halfway_sampling(img=img, condition=q, t=1)
        y_t = dec_t(s_t).numpy()

    # --- ours, with converted weights ---
    from ladiffcodec_tpu.models.seanet import SEANetEncoder, SEANetDecoder
    from ladiffcodec_tpu.models.unet1d import Unet1D
    from ladiffcodec_tpu.quantization import rvq_encode, rvq_decode
    from ladiffcodec_tpu.diffusion import GaussianDiffusion1D, make_schedule

    cond_enc = SEANetEncoder(channels=1, dimension=DIM, n_filters=4,
                             ratios=(8, 5, 4, 2), causal=True, lstm=2)
    unet = Unet1D(dim=16, dim_mults=(1, 2, 2, 4, 4), inp_channels=DIM,
                  other_cond=True, cond_channels=DIM, upsampling_ratios=(5, 4, 2),
                  unet_scale_cond=True)
    dec = SEANetDecoder(channels=1, dimension=DIM, n_filters=4, ratios=(8,),
                        causal=True, lstm=0)

    enc_params = {"params": tc.seanet_encoder(sd_np(cond_enc_t), "", (8, 5, 4, 2), 1, 2)}
    rvq_state = tc.rvq_state(sd_np(rvq_t), "")
    unet_params = {"params": tc.unet1d(sd_np(unet_t), "", n_stages=5,
                                       upsampling_ratios=(5, 4, 2))}
    dec_params = {"params": tc.seanet_decoder(sd_np(dec_t), "", (8,), 1, 0)}

    gd = GaussianDiffusion1D(schedule=make_schedule(1000, "cosine"))

    x = jnp.asarray(wav.numpy().transpose(0, 2, 1))
    c_j = cond_enc.apply(enc_params, x)
    codes = rvq_encode(rvq_state, c_j, 3)
    q_j = rvq_decode(rvq_state, codes)
    raw = unet.apply(unet_params, q_j, method=lambda m, cc: m.cond_upsampler(cc))
    img_j = raw / (jnp.max(jnp.abs(raw)) + 1e-8)

    def model_fn(xx, tt, cc):
        return unet.apply(unet_params, xx, tt, cc)

    s_j = gd.halfway_sampling(model_fn, img_j, 1, jax.random.PRNGKey(0), q_j)
    y_j = dec.apply(dec_params, s_j)

    np.testing.assert_allclose(
        np.asarray(y_j).transpose(0, 2, 1), y_t, rtol=5e-3, atol=5e-4
    )
