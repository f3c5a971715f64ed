"""Round-3 sampler search, part 3: chain starts derived from the CODEC AUDIO.

diag_sampler2 showed the cond-upsampler chain start is ~-56 dB from the
target latent, and even full conditional generation from noise (mel 1.41)
does not beat the codec itself (mel 0.58).  But the de-quantizer may start
from ANY function of the bitstream.  Here: decode the codec audio, re-encode
it with the frozen stage-2 AE encoder -> a latent that is as close to the
target as the codec is to the input -> SDEdit (noise to level t, denoise t
steps, conditioned on the upsampled codes) cleans codec artifacts.

  start_enc = encode(codec_decode(codes)) / gs      (bitstream-only info)
  sdedit_t  = halfway(q_sample(start_enc, t), t)
  hybrid    = plain halfway from start_enc (no noising)

Run on TPU:  python scripts/diag_sampler3.py --diff ... --codec ...
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
    ap.add_argument("--sdedit_ts", nargs="+", type=int, default=[25, 50, 100, 200, 400])
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

    x = dev_batch(args.data, args.seconds, args.n_files)

    @jax.jit
    def run(vd, vc, xx, key):
        out = {}
        rep = model.apply(vd, xx, method="encode") / gs
        # bitstream-only info: quantized latent (the cond) + codec audio
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

        def model_fn(z, t, c):
            return model.apply(vd, z, t, c, True, method="diff_model_fn")

        # plain halfway from the encoded-codec-audio start (no noising)
        key, sub = jax.random.split(key)
        out["hybrid_50"] = diffusion.halfway_sampling(model_fn, start_enc, 50, sub, img)

        # SDEdit from the encoded-codec-audio start
        for t in args.sdedit_ts:
            key, k1, k2 = jax.random.split(key, 3)
            tb = jnp.full((B,), t - 1, jnp.int32)
            noise = jax.random.normal(k1, start_enc.shape, start_enc.dtype)
            x_t = diffusion.q_sample(start_enc, tb, noise)
            out[f"sdedit_{t}"] = diffusion.halfway_sampling(model_fn, x_t, t, k2, img)

        names = ["hybrid_50"] + [f"sdedit_{t}" for t in args.sdedit_ts]
        for name in names:
            out["dec_" + name] = model.apply(vd, out[name] * gs, method="decode")
        out["dec_start_enc"] = model.apply(vd, start_enc * gs, method="decode")
        return out

    out = jax.device_get(run(vars_diff, vars_codec, x, jax.random.PRNGKey(0)))
    rep = out["rep"]
    xw = np.asarray(x)[..., 0]

    print(f"\nstart_enc latent SI-SNR vs rep: {lat_sisnr(rep, out['start_enc']):.2f} dB")

    def rms_align(ref, est):
        r = np.sqrt((ref**2).sum(-1, keepdims=True))
        e = np.sqrt((est**2).sum(-1, keepdims=True)) + 1e-8
        return est * (r / e)

    print(f"\n{'variant':<16} {'latent SI-SNR':>14} {'wav SI-SNR':>11} {'mel':>8} {'mel(rms-al)':>12}")
    names = (["dec_codec", "dec_start_enc", "dec_hybrid_50"]
             + [f"dec_sdedit_{t}" for t in args.sdedit_ts])
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
