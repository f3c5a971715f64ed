"""Per-file flagship-gate breakdown (round 4).

The 8-file diag protocol (diag_sampler5) shows the r8 deterministic
dequantizer beating the codec's own decode on mel by ~30%, but the 32-file
eval_quality gate shows it ~4% WORSE — while SI-SNR beats the codec on both.
Same mel function (losses_fn.melspec_loss_fn, range(5,12)), same 1.2 s clips;
the file sets differ (first 8 vs first 32 of the eval split).  This prints
the gate metrics PER FILE for the codec decode and the best dequantizers so
the aggregate discrepancy can be attributed: a few catastrophic files vs a
uniform gap, and raw-mel vs rms-aligned-mel sensitivity.

Run on TPU:  python scripts/diag_perfile.py --diff saved_models/stage3_diff_r8/model_best \
                 --codec saved_models/stage1_codec_nodisc/model_best
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
from scripts.eval_quality import load_vars, dev_batch


def si_snr_1(ref, est, eps=1e-8):
    ref = ref - ref.mean()
    est = est - est.mean()
    dot = float((ref * est).sum())
    s = dot * ref / (float((ref**2).sum()) + eps)
    e = est - s
    return float(10.0 * np.log10((s**2).sum() / ((e**2).sum() + eps) + eps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--diff", required=True)
    ap.add_argument("--codec", required=True)
    ap.add_argument("--data", default="data_synth")
    ap.add_argument("--seconds", type=float, default=1.2)
    ap.add_argument("--n_files", type=int, default=32)
    ap.add_argument("--cond_bandwidth", type=float, default=1.5)
    args = ap.parse_args()

    from ladiffcodec_tpu.utils.checkpoint import load_run_config

    cfg = load_run_config(args.diff)
    gs = float(cfg.get("global_scale", 18.0))
    data_std = float(cfg.get("data_std", 1.0))
    objective = cfg.get("diff_objective", "pred_noise")
    print(f"global_scale = {gs}  data_std = {data_std}  objective = {objective}")

    vars_diff = load_vars(args.diff)
    vars_codec = load_vars(args.codec)

    model = DiffAudioRep(
        rep_dims=128, diff_dims=128, n_filters=32, lstm=2,
        enc_ratios=(8,), run_diff=True, model_type="unet",
        scaling_global=True, global_scale=gs, data_std=data_std,
        diff_objective=objective,
        other_cond=True, cond_channels=128,
        upsampling_ratios=(5, 4, 2), unet_scale_cond=True,
    )
    cond_model = DiffAudioRep(
        rep_dims=128, n_filters=32, lstm=2, enc_ratios=(8, 5, 4, 2),
        quantization=True, bandwidth=args.cond_bandwidth,
    )
    diffusion = model.diffusion

    x = dev_batch(args.data, args.seconds, args.n_files)
    B = x.shape[0]

    @jax.jit
    def run(vd, vc, xx, key):
        out = {}
        (losses, aux) = cond_model.apply(vc, xx, training=False,
                                         mutable=["quantizer"])[0]
        out["codec"] = aux["x_hat"]
        cond = cond_model.apply(vc, xx, method="get_cond")
        raw = model.apply(vd, cond, method=lambda m, c: m.diff_model.cond_upsampler(c))
        img = raw / (jnp.max(jnp.abs(raw.reshape(B, -1)), axis=1)[:, None, None] + 1e-8)
        start_enc = model.apply(vd, aux["x_hat"], method="encode") / gs

        def model_fn(z, t, c):
            return model.apply(vd, z, t, c, True, method="diff_model_fn")

        ab = diffusion.schedule.alphas_cumprod
        for t in (160, 200):
            tb = jnp.full((B,), t, jnp.int32)
            preds = diffusion.model_predictions(
                model_fn, jnp.sqrt(ab[t]) * start_enc, tb, img)
            out[f"onestep_{t}"] = model.apply(
                vd, preds.pred_x_start * gs, method="decode")
        key, sub = jax.random.split(key)
        out["ddim_200_8"] = model.apply(
            vd, diffusion.ddim_from(
                model_fn, jnp.sqrt(ab[200]) * start_enc, 200, 8, sub, img) * gs,
            method="decode")
        return out

    out = jax.device_get(run(vars_diff, vars_codec, x, jax.random.PRNGKey(0)))
    xn = np.asarray(x)

    mel1 = jax.jit(lambda r, e: melspec_loss_fn(r, e, range(5, 12)))

    names = ["codec", "onestep_160", "onestep_200", "ddim_200_8"]
    per = {n: [] for n in names}
    print(f"\n{'file':>4} | " + " | ".join(
        f"{n:>11} mel (al)    snr" for n in names))
    for i in range(B):
        ref = xn[i:i + 1]
        row = [f"{i:>4} |"]
        for n in names:
            est = np.asarray(out[n][i:i + 1])
            m_raw = float(mel1(jnp.asarray(ref), jnp.asarray(est)))
            g = np.sqrt((ref**2).sum() / ((est**2).sum() + 1e-8))
            m_al = float(mel1(jnp.asarray(ref), jnp.asarray(est * g)))
            snr = si_snr_1(ref[0, :, 0], est[0, :, 0])
            per[n].append((m_raw, m_al, snr))
            row.append(f" {m_raw:7.3f} {m_al:7.3f} {snr:6.2f} |")
        print("".join(row))

    print("\naggregate (mean over files):")
    for n in names:
        a = np.array(per[n])
        print(f"  {n:<12} mel {a[:,0].mean():.3f}  mel(al) {a[:,1].mean():.3f}  "
              f"snr {a[:,2].mean():.2f}")
    print("\nwins vs codec (per-file, rms-aligned mel):")
    c = np.array(per["codec"])[:, 1]
    for n in names[1:]:
        a = np.array(per[n])[:, 1]
        print(f"  {n:<12} {int((a < c).sum())}/{B} files better; "
              f"median delta {np.median(a - c):+.3f}, worst {np.max(a - c):+.3f}")


if __name__ == "__main__":
    main()
