"""Measure the PyTorch reference's production decode RTF (BASELINE.md TODO).

Assembles the reference's own torch modules (via tests/ref_shim) into the
srcs.sample pipeline: cond codec encode (SEANet + RVQ) -> upsample ->
halfway_sampling (100 ancestral steps, ddpm_loss.py:370-385) -> decoder.
The reference cannot run unmodified (broken imports, SURVEY Appendix A);
this reconstructs exactly the modules its CLI would execute.

Run: python scripts/measure_reference_rtf.py
"""

import importlib.util
import sys
import time

sys.path.insert(0, "tests")
import torch

from ref_shim import reference_modules, reference_quantization, _load, REF

torch.manual_seed(0)
ref = reference_modules()
refq = reference_quantization()
ddpm = _load("refmod", f"{REF}/losses", "ddpm_loss")

SECONDS = 2.4
L = int(SECONDS * 16000) // 640 * 640

with torch.no_grad():
    cond_enc = ref.SEANetEncoder(channels=1, dimension=128, n_filters=32,
                                 ratios=[8, 5, 4, 2], causal=True, lstm=2).eval()
    rvq = refq.vq.ResidualVectorQuantizer(dimension=128, n_q=3, bins=1024,
                                          kmeans_init=False).eval()
    unet = ref.unet.Unet1D(dim=128, dim_mults=(1, 2, 2, 4, 4), inp_channels=128,
                           other_cond=True, cond_channels=128,
                           upsampling_ratios=[5, 4, 2], unet_scale_cond=True).eval()
    dec = ref.SEANetDecoder(channels=1, dimension=128, n_filters=32, ratios=[8],
                            causal=True, lstm=0).eval()
    diffusion = ddpm.GaussianDiffusion1D(model=unet, seq_length=L // 8).eval()

    x = torch.randn(1, 1, L) * 0.1

    def decode_once():
        c = cond_enc(x)
        q, codes, _ = rvq.vq(c, n_q=3)
        img = q
        for layer in unet.upsampling_layers:
            img = layer(img)
        img = img / (img.abs().max() + 1e-8)
        s = diffusion.halfway_sampling(img=img, condition=q, t=100)
        return dec(s)

    y = decode_once()  # warmup
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        y = decode_once()
    dt = time.perf_counter() - t0
    rtf = SECONDS * iters / dt
    print(f"reference torch CPU ({torch.get_num_threads()} threads): "
          f"{rtf:.2f}x real-time ({dt/iters:.2f} s per 2.4 s clip)")
