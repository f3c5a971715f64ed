"""Diagnose the stage-3 halfway-sampler failure (round 3).

Training shows single-forward decode SDR ~ -4.5 dB (random t) yet the
100-step halfway chain evaluates at -42 dB SI-SNR.  This script separates
the possible causes by measuring, in the LATENT domain (vs rep = enc(x)/gs):

  a. chain-start quality: SI-SNR(rep, normalized-upsampled-cond * lat_scale)
  b. denoiser on-distribution: one-step x0 from q_sample(rep, t) at several t
  c. denoiser at the sampler's actual start: one-step x0 from the chain start
  d. full halfway chains at t in {10, 25, 50, 100}
  e. waveform decode of (a), (d) plus the AE bound decode(rep*gs)

Run on TPU from /root/repo:
  python scripts/diag_diffusion.py --diff saved_models/stage3_diff_v3/model_best \
      --codec saved_models/stage1_codec_nodisc/model_best --seconds 1.2
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


def lat_sisnr(ref, est):
    """SI-SNR over flattened latent maps (B, T, C)."""
    B = ref.shape[0]
    return si_snr(np.asarray(ref).reshape(B, -1), np.asarray(est).reshape(B, -1))


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
    ap.add_argument("--halfway_ts", nargs="+", type=int, default=[10, 25, 50, 100])
    ap.add_argument("--onestep_ts", nargs="+", type=int, default=[9, 49, 99, 299])
    args = ap.parse_args()

    if args.global_scale is None:
        from ladiffcodec_tpu.utils.checkpoint import load_run_config

        cfg = load_run_config(args.diff)
        args.global_scale = float(cfg.get("global_scale", 18.0))
    gs = args.global_scale
    print(f"global_scale = {gs}")

    vars_diff = load_vars(args.diff)
    vars_codec = load_vars(args.codec)

    model = DiffAudioRep(
        rep_dims=128, diff_dims=128, n_filters=32, lstm=2,
        enc_ratios=tuple(args.ae_ratios), run_diff=True, model_type="unet",
        scaling_global=True, global_scale=gs,
        other_cond=True, cond_channels=128,
        upsampling_ratios=tuple(args.upsampling_ratios), unet_scale_cond=True,
    )
    cond_model = DiffAudioRep(
        rep_dims=128, n_filters=32, lstm=2, enc_ratios=(8, 5, 4, 2),
        quantization=True, bandwidth=args.cond_bandwidth,
    )
    diffusion = model.diffusion

    x = dev_batch(args.data, args.seconds, args.n_files)
    print(f"x: {x.shape}")

    def model_fn_factory(vd):
        def model_fn(z, t, c):
            return model.apply(vd, z, t, c, True, method="diff_model_fn")
        return model_fn

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
        out["chain"] = chain
        out["lat_scale"] = lat_scale

        model_fn = model_fn_factory(vd)

        # (b) on-distribution one-step x0 at fixed t
        for t in args.onestep_ts:
            key, sub = jax.random.split(key)
            tb = jnp.full((B,), t, jnp.int32)
            noise = jax.random.normal(sub, rep.shape, rep.dtype)
            x_t = diffusion.q_sample(rep, tb, noise)
            pred = diffusion.model_predictions(model_fn, x_t, tb, img).pred_x_start
            out[f"onestep_t{t}"] = pred

        # (c) one-step x0 from the chain start at the largest halfway t
        t0 = max(args.halfway_ts) - 1
        tb = jnp.full((B,), t0, jnp.int32)
        out["onestep_chainstart"] = diffusion.model_predictions(
            model_fn, chain, tb, img).pred_x_start

        # (d) halfway chains
        for t in args.halfway_ts:
            key, sub = jax.random.split(key)
            out[f"halfway_t{t}"] = diffusion.halfway_sampling(
                model_fn, chain, t, sub, img)

        # (e) decodes
        out["dec_ae"] = model.apply(vd, rep * gs, method="decode")
        out["dec_chain"] = model.apply(vd, chain * gs, method="decode")
        out[f"dec_halfway_t{max(args.halfway_ts)}"] = model.apply(
            vd, out[f"halfway_t{max(args.halfway_ts)}"] * gs, method="decode")
        return out

    out = jax.device_get(run(vars_diff, vars_codec, x, jax.random.PRNGKey(0)))
    rep = out["rep"]
    xw = np.asarray(x)[..., 0]

    print(f"\nlat_scale (mean max-abs of rep) = {float(out['lat_scale']):.3f}")
    print(f"rep RMS = {float(np.sqrt(np.mean(rep**2))):.3f}, "
          f"per-ex max-abs = {np.max(np.abs(rep.reshape(rep.shape[0], -1)), 1).round(2)}")

    print(f"\n{'probe':<36} {'latent SI-SNR dB':>16}")
    print(f"{'chain start (norm upsampled cond)':<36} {lat_sisnr(rep, out['chain']):>16.2f}")
    for t in args.onestep_ts:
        print(f"{f'one-step x0 @ t={t} (on-dist)':<36} {lat_sisnr(rep, out[f'onestep_t{t}']):>16.2f}")
    print(f"{'one-step x0 @ chain start':<36} {lat_sisnr(rep, out['onestep_chainstart']):>16.2f}")
    for t in args.halfway_ts:
        print(f"{f'halfway chain t={t}':<36} {lat_sisnr(rep, out[f'halfway_t{t}']):>16.2f}")

    print(f"\n{'decode':<36} {'SI-SNR dB':>10} {'mel':>8}")
    for name in ("dec_ae", "dec_chain", f"dec_halfway_t{max(args.halfway_ts)}"):
        est = np.asarray(out[name])[..., 0]
        mel = float(melspec_loss_fn(x, jnp.asarray(out[name]), range(5, 12)))
        print(f"{name:<36} {si_snr(xw, est):>10.2f} {mel:>8.3f}")


if __name__ == "__main__":
    main()
