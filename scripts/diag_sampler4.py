"""Round-3 midway_t sweep on the cond_pred-trained stage-3 model.

With `--cond_pred_weight` the upsampler output (process_cond, i.e. the
normalized chain start of the reference production sampler,
srcs/sample.py:125-131) is trained as a direct prediction of the scaled
target latent.  The production question becomes: how much ancestral
denoising on top of that prediction HELPS vs HURTS?  Rows:

  pred_0      decode the chain start directly (no diffusion at all)
  halfway_t   reference halfway chain truncated at midway_t = t
  codec       the condition codec's own decode (the bar to beat)

Also prints the chain start's own latent SI-SNR (cond_pred quality).

Run on TPU:  python scripts/diag_sampler4.py --diff ... --codec ...
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
    ap.add_argument("--data_std", type=float, default=None,
                    help="SNR-shift divisor; default: read from config.json")
    ap.add_argument("--sdedit", action="store_true",
                    help="also run noise-matched sdedit rows: chain start "
                         "noised to midway_t via q_sample, then denoised")
    ap.add_argument("--ae_ratios", nargs="+", type=int, default=[8])
    ap.add_argument("--upsampling_ratios", nargs="+", type=int, default=[5, 4, 2])
    ap.add_argument("--midway_ts", nargs="+", type=int, default=[1, 5, 10, 25, 50, 100])
    args = ap.parse_args()

    from ladiffcodec_tpu.utils.checkpoint import load_run_config

    cfg = load_run_config(args.diff)
    if not cfg:
        print(f"WARNING: no config.json found for {args.diff} — "
              f"falling back to flag/default hyperparameters")
    if args.global_scale is None:
        args.global_scale = float(cfg.get("global_scale", 18.0))
    if args.data_std is None:
        args.data_std = float(cfg.get("data_std", 1.0))
    gs = args.global_scale
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

    x = dev_batch(args.data, args.seconds, args.n_files)
    mts = tuple(args.midway_ts)

    @jax.jit
    def run(vd, vc, xx, key):
        out = {}
        rep = model.apply(vd, xx, method="encode") / gs
        cond = cond_model.apply(vc, xx, method="get_cond")
        # the production chain start: process_cond = upsample + max-abs scale
        img = model.apply(vd, cond, method=lambda m, c: m.diff_model.process_cond(c))
        out["rep"] = rep
        out["img"] = img

        def model_fn(z, t, c):
            return model.apply(vd, z, t, c, True, method="diff_model_fn")

        out["pred_0"] = img
        names = ["pred_0"]
        for t in mts:
            key, sub = jax.random.split(key)
            out[f"halfway_{t}"] = diffusion.halfway_sampling(model_fn, img, t, sub, img)
            names.append(f"halfway_{t}")
            if args.sdedit and t > 0:
                key, kn, ks = jax.random.split(key, 3)
                tt = jnp.full((img.shape[0],), t, jnp.int32)
                noised = diffusion.q_sample(img, tt, jax.random.normal(kn, img.shape))
                out[f"sdedit_{t}"] = diffusion.halfway_sampling(model_fn, noised, t, ks, img)
                names.append(f"sdedit_{t}")

        for name in names:
            out["dec_" + name] = model.apply(vd, out[name] * gs, method="decode")
        out["dec_codec"] = cond_model.apply(vc, xx, training=False,
                                            mutable=["quantizer"])[0][1]["x_hat"]
        return out

    out = jax.device_get(run(vars_diff, vars_codec, x, jax.random.PRNGKey(0)))
    rep = out["rep"]
    xw = np.asarray(x)[..., 0]

    def rms_align(ref, est):
        r = np.sqrt((ref**2).sum(-1, keepdims=True))
        e = np.sqrt((est**2).sum(-1, keepdims=True)) + 1e-8
        return est * (r / e)

    print(f"chain start (process_cond) latent SI-SNR vs rep: "
          f"{lat_sisnr(rep, out['img']):.2f} dB")
    print(f"\n{'sampler':<14} {'latent SI-SNR':>14} {'wav SI-SNR':>11} {'mel':>8} {'mel(rms-al)':>12}")
    names = ["pred_0"]
    for t in mts:
        names.append(f"halfway_{t}")
        if args.sdedit and t > 0:
            names.append(f"sdedit_{t}")
    for name in names:
        lat = lat_sisnr(rep, out[name])
        est = np.asarray(out["dec_" + name])[..., 0]
        mel = float(melspec_loss_fn(x, jnp.asarray(out["dec_" + name]), range(5, 12)))
        mel_al = float(melspec_loss_fn(
            x, jnp.asarray(rms_align(xw, est))[..., None], range(5, 12)))
        print(f"{name:<14} {lat:>14.2f} {si_snr(xw, est):>11.2f} {mel:>8.3f} {mel_al:>12.3f}")
    est = np.asarray(out["dec_codec"])[..., 0]
    mel = float(melspec_loss_fn(x, jnp.asarray(out["dec_codec"]), range(5, 12)))
    print(f"{'codec':<14} {'-':>14} {si_snr(xw, est):>11.2f} {mel:>8.3f}")


if __name__ == "__main__":
    main()
