"""Round-4 sampler search, part 5: DETERMINISTIC de-quantization chains.

diag_sampler3 (round 4, r7 weights) showed sdedit from the re-encoded codec
latent improves latent/wav SI-SNR monotonically with t but costs mel at the
32-file protocol — the fresh q_sample noise injected at the chain start is
stochastically regenerated, trading spectral fidelity for manifold
projection.  This probes the noise-free variants: treat the re-encoded
latent start_enc = encode(codec_decode(codes)))/gs as x_t directly (its only
"noise" IS the codec error; the SNR-shifted schedule's noise_std crosses the
measured -11.7 dB codec-error scale at t~160) and

  onestep_t  = model x0 prediction from (sqrt(ab_t) * start_enc, t)   [1 call]
  ddim_t_s   = eta=0 DDIM from sqrt(ab_t) * start_enc over the last t
               levels in s calls                                      [s calls]

Both are deterministic: no noise is added, so nothing is regenerated —
pure projection toward the learned manifold (reference analogue: the
halfway chain of srcs/ddpm_loss.py:370-385 is the stochastic version).

Run on TPU:  python scripts/diag_sampler5.py --diff ... --codec ...
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from ladiffcodec_tpu.models.diff_rep import DiffAudioRep
from ladiffcodec_tpu.losses.losses_fn import melspec_loss_fn
from scripts.eval_quality import load_vars, dev_batch, si_snr
from scripts.diag_diffusion import lat_sisnr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--diff", required=True)
    ap.add_argument("--codec", required=True)
    ap.add_argument("--data", default="data_synth")
    ap.add_argument("--seconds", type=float, default=1.2)
    ap.add_argument("--n_files", type=int, default=8)
    ap.add_argument("--cond_bandwidth", type=float, default=1.5)
    ap.add_argument("--global_scale", type=float, default=None)
    ap.add_argument("--ae_ratios", nargs="+", type=int, default=[8])
    ap.add_argument("--upsampling_ratios", nargs="+", type=int, default=[5, 4, 2])
    ap.add_argument("--onestep_ts", nargs="+", type=int,
                    default=[50, 100, 160, 200, 300, 400])
    ap.add_argument("--ddim_cfgs", nargs="+", default=["160:4", "200:4", "400:8"],
                    help="t_start:steps pairs for eta=0 ddim_from")
    args = ap.parse_args()

    from ladiffcodec_tpu.utils.checkpoint import load_run_config

    cfg = load_run_config(args.diff)
    if args.global_scale is None:
        args.global_scale = float(cfg.get("global_scale", 18.0))
    gs = args.global_scale
    args.data_std = float(cfg.get("data_std", 1.0))
    args.diff_objective = cfg.get("diff_objective", "pred_noise")
    print(f"global_scale = {gs}   data_std = {args.data_std}   "
          f"objective = {args.diff_objective}")

    vars_diff = load_vars(args.diff)
    vars_codec = load_vars(args.codec)

    model = DiffAudioRep(
        rep_dims=128, diff_dims=128, n_filters=32, lstm=2,
        enc_ratios=tuple(args.ae_ratios), run_diff=True, model_type="unet",
        scaling_global=True, global_scale=gs, data_std=args.data_std,
        diff_objective=args.diff_objective,
        other_cond=True, cond_channels=128,
        upsampling_ratios=tuple(args.upsampling_ratios), unet_scale_cond=True,
    )
    cond_model = DiffAudioRep(
        rep_dims=128, n_filters=32, lstm=2, enc_ratios=(8, 5, 4, 2),
        quantization=True, bandwidth=args.cond_bandwidth,
    )
    diffusion = model.diffusion
    ddim_cfgs = [tuple(int(v) for v in c.split(":")) for c in args.ddim_cfgs]

    x = dev_batch(args.data, args.seconds, args.n_files)

    @jax.jit
    def run(vd, vc, xx, key):
        out = {}
        rep = model.apply(vd, xx, method="encode") / gs
        (losses, aux) = cond_model.apply(vc, xx, training=False,
                                         mutable=["quantizer"])[0]
        codec_audio = aux["x_hat"]
        cond = cond_model.apply(vc, xx, method="get_cond")
        raw = model.apply(vd, cond, method=lambda m, c: m.diff_model.cond_upsampler(c))
        B = raw.shape[0]
        img = raw / (jnp.max(jnp.abs(raw.reshape(B, -1)), axis=1)[:, None, None] + 1e-8)

        start_enc = model.apply(vd, codec_audio, method="encode") / gs
        out["rep"] = rep
        out["start_enc"] = start_enc
        out["dec_codec"] = codec_audio

        # error-fusion start: the re-encoded latent (-11.7 dB, on-manifold)
        # and the trained cond_pred latent (process_cond, -12.0 dB, L2 blur)
        # have partially independent errors; their mean should sit several
        # dB closer to rep than either (still bitstream-only information)
        cond_lat = model.apply(
            vd, cond, method=lambda m, c: m.diff_model.process_cond(c))
        out["cond_lat"] = cond_lat
        fuse = 0.5 * (start_enc + cond_lat)
        out["fuse"] = fuse
        out["dec_fuse"] = model.apply(vd, fuse * gs, method="decode")

        def model_fn(z, t, c):
            return model.apply(vd, z, t, c, True, method="diff_model_fn")

        ab = diffusion.schedule.alphas_cumprod

        # deterministic one-step x0 projection at each matched noise level
        for t in args.onestep_ts:
            tb = jnp.full((B,), t, jnp.int32)
            x_t = jnp.sqrt(ab[t]) * start_enc
            preds = diffusion.model_predictions(model_fn, x_t, tb, img)
            out[f"onestep_{t}"] = preds.pred_x_start

        # eta=0 DDIM from the scaled start over the last t levels
        for t, s in ddim_cfgs:
            key, sub = jax.random.split(key)
            out[f"ddim_{t}_{s}"] = diffusion.ddim_from(
                model_fn, jnp.sqrt(ab[t]) * start_enc, t, s, sub, img)

        # same two deterministic chains from the fused start
        for t in (100, 160, 200):
            tb = jnp.full((B,), t, jnp.int32)
            preds = diffusion.model_predictions(
                model_fn, jnp.sqrt(ab[t]) * fuse, tb, img)
            out[f"fuse_onestep_{t}"] = preds.pred_x_start
        key, sub = jax.random.split(key)
        out["fuse_ddim_200_4"] = diffusion.ddim_from(
            model_fn, jnp.sqrt(ab[200]) * fuse, 200, 4, sub, img)

        names = ([f"onestep_{t}" for t in args.onestep_ts]
                 + [f"ddim_{t}_{s}" for t, s in ddim_cfgs]
                 + [f"fuse_onestep_{t}" for t in (100, 160, 200)]
                 + ["fuse_ddim_200_4"])
        for name in names:
            out["dec_" + name] = model.apply(vd, out[name] * gs, method="decode")
        out["dec_start_enc"] = model.apply(vd, start_enc * gs, method="decode")
        return out

    out = jax.device_get(run(vars_diff, vars_codec, x, jax.random.PRNGKey(0)))
    rep = out["rep"]
    xw = np.asarray(x)[..., 0]

    print(f"\nstart_enc latent SI-SNR vs rep: {lat_sisnr(rep, out['start_enc']):.2f} dB")
    print(f"cond_lat  latent SI-SNR vs rep: {lat_sisnr(rep, out['cond_lat']):.2f} dB")
    print(f"fuse      latent SI-SNR vs rep: {lat_sisnr(rep, out['fuse']):.2f} dB")

    def rms_align(ref, est):
        r = np.sqrt((ref**2).sum(-1, keepdims=True))
        e = np.sqrt((est**2).sum(-1, keepdims=True)) + 1e-8
        return est * (r / e)

    print(f"\n{'variant':<16} {'latent SI-SNR':>14} {'wav SI-SNR':>11} {'mel':>8} {'mel(rms-al)':>12}")
    names = (["dec_codec", "dec_start_enc", "dec_fuse"]
             + [f"dec_onestep_{t}" for t in args.onestep_ts]
             + [f"dec_ddim_{t}_{s}" for t, s in ddim_cfgs]
             + [f"dec_fuse_onestep_{t}" for t in (100, 160, 200)]
             + ["dec_fuse_ddim_200_4"])
    for name in names:
        lat_name = name[4:]
        lat = (lat_sisnr(rep, out[lat_name])
               if lat_name in out and lat_name not in ("codec",) else float("nan"))
        est = np.asarray(out[name])[..., 0]
        mel = float(melspec_loss_fn(x, jnp.asarray(out[name]), range(5, 12)))
        mel_al = float(melspec_loss_fn(
            x, jnp.asarray(rms_align(xw, est))[..., None], range(5, 12)))
        print(f"{lat_name:<16} {lat:>14.2f} {si_snr(xw, est):>11.2f} {mel:>8.3f} {mel_al:>12.3f}")


if __name__ == "__main__":
    main()
