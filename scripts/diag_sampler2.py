"""Round-3 sampler comparison on the trained stage-3 model.

diag_diffusion.py showed: denoiser good on-distribution, but the reference's
halfway chain starts from the CLEAN upsampled cond, which is ~-56 dB from the
target latent — off-distribution at every step.  This run compares samplers
that stay on-distribution:

  * halfway (reference production): clean cond start, t ancestral steps
  * sdedit_t: q_sample(chain, t) start (correctly noised), t ancestral steps
  * ancestral_full: pure noise, all T steps, conditioned
  * ddim_N: pure noise, N DDIM steps, conditioned

Reports latent SI-SNR and decoded mel (RMS-aligned) per sampler.
Run on TPU:  python scripts/diag_sampler2.py --diff ... --codec ...
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
    ap.add_argument("--data_std", type=float, default=None)
    ap.add_argument("--ae_ratios", nargs="+", type=int, default=[8])
    ap.add_argument("--upsampling_ratios", nargs="+", type=int, default=[5, 4, 2])
    args = ap.parse_args()

    from ladiffcodec_tpu.utils.checkpoint import load_run_config

    cfg = load_run_config(args.diff)
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

    @jax.jit
    def run(vd, vc, xx, key):
        out = {}
        rep = model.apply(vd, xx, method="encode") / gs
        cond = cond_model.apply(vc, xx, method="get_cond")
        raw = model.apply(vd, cond, method=lambda m, c: m.diff_model.cond_upsampler(c))
        B = raw.shape[0]
        img = raw / (jnp.max(jnp.abs(raw.reshape(B, -1)), axis=1)[:, None, None] + 1e-8)
        lat_scale = jnp.mean(jnp.max(jnp.abs(rep.reshape(B, -1)), axis=1))
        chain = img * lat_scale
        out["rep"] = rep

        def model_fn(z, t, c):
            return model.apply(vd, z, t, c, True, method="diff_model_fn")

        # reference production sampler
        key, sub = jax.random.split(key)
        out["halfway_100"] = diffusion.halfway_sampling(model_fn, chain, 100, sub, img)

        # SDEdit: correctly-noised cond start at several strengths
        for t in (100, 300, 500):
            key, k1, k2 = jax.random.split(key, 3)
            tb = jnp.full((B,), t - 1, jnp.int32)
            noise = jax.random.normal(k1, chain.shape, chain.dtype)
            x_t = diffusion.q_sample(chain, tb, noise)
            out[f"sdedit_{t}"] = diffusion.halfway_sampling(model_fn, x_t, t, k2, img)

        # conditional generation from pure noise
        key, sub = jax.random.split(key)
        out["ancestral_1000"] = diffusion.p_sample_loop(model_fn, rep.shape, sub, img)
        key, sub = jax.random.split(key)
        out["ddim_100"] = diffusion.ddim_sample(
            model_fn, rep.shape, sub, img, sampling_timesteps=100)

        # decodes
        for name in ("halfway_100", "sdedit_100", "sdedit_300", "sdedit_500",
                     "ancestral_1000", "ddim_100"):
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

    print(f"\n{'sampler':<18} {'latent SI-SNR':>14} {'wav SI-SNR':>11} {'mel':>8} {'mel(rms-al)':>12}")
    names = ["halfway_100", "sdedit_100", "sdedit_300", "sdedit_500",
             "ancestral_1000", "ddim_100"]
    for name in names:
        lat = lat_sisnr(rep, out[name])
        est = np.asarray(out["dec_" + name])[..., 0]
        mel = float(melspec_loss_fn(x, jnp.asarray(out["dec_" + name]), range(5, 12)))
        mel_al = float(melspec_loss_fn(
            x, jnp.asarray(rms_align(xw, est))[..., None], range(5, 12)))
        print(f"{name:<18} {lat:>14.2f} {si_snr(xw, est):>11.2f} {mel:>8.3f} {mel_al:>12.3f}")
    est = np.asarray(out["dec_codec"])[..., 0]
    mel = float(melspec_loss_fn(x, jnp.asarray(out["dec_codec"]), range(5, 12)))
    print(f"{'codec (condition)':<18} {'-':>14} {si_snr(xw, est):>11.2f} {mel:>8.3f}")


if __name__ == "__main__":
    main()
