"""Quality evidence (VERDICT r1 item 2): SI-SNR and mel distance of each
trained stage on held-out dev-clean speech, including the full production
decode (codec codes -> diffusion halfway sampler -> continuous decoder).

Usage (TPU, after the stages have trained):
  python scripts/eval_quality.py --codec saved_models/stage1_codec_nodisc/model_best \
      --ae saved_models/stage2_ae/model_best --diff saved_models/stage3_diff/model_best

Rows: codec @3.0, codec @1.5 (same params, first 3 of 6 RVQ books),
continuous AE, diffusion de-quantized @1.5/@3.0, all vs the input.
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
from ladiffcodec_tpu.data.librispeech import DatasetLibri
from ladiffcodec_tpu.utils.checkpoint import load_checkpoint_path
from ladiffcodec_tpu.losses.losses_fn import melspec_loss_fn
from ladiffcodec_tpu.losses.stoi import stoi_batch
from ladiffcodec_tpu.quantization.core import RVQState


def si_snr(ref: np.ndarray, est: np.ndarray, eps: float = 1e-8) -> float:
    """Mean scale-invariant SNR (dB) over the batch; inputs (B, L)."""
    ref = ref - ref.mean(axis=-1, keepdims=True)
    est = est - est.mean(axis=-1, keepdims=True)
    dot = np.sum(ref * est, axis=-1, keepdims=True)
    s_target = dot * ref / (np.sum(ref**2, axis=-1, keepdims=True) + eps)
    e = est - s_target
    ratio = np.sum(s_target**2, axis=-1) / (np.sum(e**2, axis=-1) + eps)
    return float(np.mean(10.0 * np.log10(ratio + eps)))


def mel_l1(ref: jnp.ndarray, est: jnp.ndarray) -> float:
    """Multi-scale log-mel L1+L2 distance (same loss the codec trains on)."""
    return float(melspec_loss_fn(ref, est, range(5, 12)))


def load_vars(path: str):
    raw = load_checkpoint_path(None, path)
    variables = {"params": raw["params"]}
    q = raw.get("quantizer")
    if q:
        state = q.get("state", q)
        if isinstance(state, dict):
            state = RVQState(
                embed=jnp.asarray(state["embed"]),
                embed_avg=jnp.asarray(state["embed_avg"]),
                cluster_size=jnp.asarray(state["cluster_size"]),
                inited=jnp.asarray(state["inited"]),
            )
        variables["quantizer"] = {"state": state}
    return variables


def dev_batch(data, seconds, n, sample_rate=16000):
    ds = DatasetLibri("eval", seconds, data, sample_rate)
    xs = [ds[i] for i in range(min(n, len(ds)))]
    return jnp.asarray(np.stack(xs)[..., None])  # (B, L, 1)


def eval_codec(args, rows):
    vars_codec = load_vars(args.codec)
    for bw in (3.0, 1.5):
        model = DiffAudioRep(
            rep_dims=128, n_filters=32, lstm=2, enc_ratios=(8, 5, 4, 2),
            quantization=True, bandwidth=bw,
        )
        x = dev_batch(args.data, args.seconds, args.n_files)
        fwd = jax.jit(
            lambda v, xx: model.apply(v, xx, training=False, mutable=["quantizer"])[0]
        )
        (losses, aux) = fwd(vars_codec, x)
        x_hat = np.asarray(aux["x_hat"])
        rows.append((
            f"codec @{bw} kbps",
            si_snr(np.asarray(x)[..., 0], x_hat[..., 0]),
            mel_l1(x, aux["x_hat"]),
            stoi_batch(np.asarray(x)[..., 0], x_hat[..., 0]),
        ))
    return vars_codec


def eval_ae(args, rows):
    vars_ae = load_vars(args.ae)
    model = DiffAudioRep(
        rep_dims=128, n_filters=32, lstm=2, enc_ratios=tuple(args.ae_ratios),
    )
    x = dev_batch(args.data, args.seconds, args.n_files)
    fwd = jax.jit(lambda v, xx: model.apply(v, xx, training=False, mutable=["quantizer"])[0])
    (losses, aux) = fwd(vars_ae, x)
    x_hat = np.asarray(aux["x_hat"])
    rows.append((
        "continuous AE",
        si_snr(np.asarray(x)[..., 0], x_hat[..., 0]),
        mel_l1(x, aux["x_hat"]),
        stoi_batch(np.asarray(x)[..., 0], x_hat[..., 0]),
    ))
    return vars_ae


def eval_diffusion(args, rows, vars_codec):
    vars_diff = load_vars(args.diff)
    model = DiffAudioRep(
        rep_dims=128, diff_dims=128, n_filters=32, lstm=2,
        enc_ratios=tuple(args.ae_ratios), run_diff=True, model_type="unet",
        scaling_global=True, global_scale=args.global_scale,
        data_std=args.data_std, diff_objective=args.diff_objective,
        other_cond=True, cond_channels=128,
        upsampling_ratios=tuple(args.upsampling_ratios), unet_scale_cond=True,
    )
    for bw in (args.cond_bandwidth,):
        cond_model = DiffAudioRep(
            rep_dims=128, n_filters=32, lstm=2, enc_ratios=(8, 5, 4, 2),
            quantization=True, bandwidth=bw,
        )
        x = dev_batch(args.data, args.seconds, args.n_files)

        chdtype = jnp.bfloat16 if args.chain_dtype == "bfloat16" else jnp.float32

        @jax.jit
        def decode(vd, vc, xx, key):
            cond = cond_model.apply(vc, xx, method="get_cond")
            raw = model.apply(vd, cond, method=lambda m, c: m.diff_model.cond_upsampler(c))
            B = raw.shape[0]
            img = raw / (jnp.max(jnp.abs(raw.reshape(B, -1)), axis=1)[:, None, None] + 1e-8)
            diffusion = model.diffusion

            # the reference's hardcoded global 18.0 normalizes ITS encoder's
            # latents to ~unit max-abs, so its chain start (img at max-abs 1)
            # is on-distribution (srcs/sample.py:125-129, model.py:166).  Our
            # stage-2 encoder has its own scale — measure it from the frozen
            # encoder and start the chain at the latent scale the denoiser
            # was trained on.
            rep = model.apply(vd, xx, method="encode") / args.global_scale
            lat_scale = jnp.mean(
                jnp.max(jnp.abs(rep.reshape(B, -1)), axis=1))
            if args.chain_start == "reencode":
                # bitstream-only start: codec decode -> frozen stage-2 encode
                # (diag_sampler3; available at the decoder from the bitstream)
                codec_wav = cond_model.apply(vc, cond, method="decode")
                chain_img = model.apply(
                    vd, codec_wav, method="encode") / args.global_scale
            else:
                chain_img = img * lat_scale

            def model_fn(z, t, c):
                out = model.apply(vd, z.astype(chdtype), t, c.astype(chdtype),
                                  True, method="diff_model_fn")
                return out.astype(chdtype)

            if args.sampler == "halfway":
                # reference production path (srcs/sample.py:130)
                sample = diffusion.halfway_sampling(
                    model_fn, chain_img.astype(chdtype), args.midway_t, key,
                    img.astype(chdtype))
            elif args.sampler == "sdedit":
                # noise-matched start: q_sample(chain_img, midway_t) so the
                # reverse chain begins on the forward-process distribution
                key, kn = jax.random.split(key)
                tt = jnp.full((B,), args.midway_t, jnp.int32)
                noised = diffusion.q_sample(
                    chain_img, tt, jax.random.normal(kn, chain_img.shape))
                sample = diffusion.halfway_sampling(
                    model_fn, noised.astype(chdtype), args.midway_t, key,
                    img.astype(chdtype))
            elif args.sampler in ("onestep", "ddim_deq"):
                # deterministic dequantization (diag_sampler5): the chain
                # start IS x_t — its only "noise" is the codec error, which
                # crosses the SNR-shifted schedule's noise_std near t~160
                # for the r7 stack — so no fresh noise is injected and
                # nothing is stochastically regenerated.
                ab = diffusion.schedule.alphas_cumprod
                x_t = (jnp.sqrt(ab[args.midway_t]) * chain_img).astype(chdtype)
                if args.sampler == "onestep":
                    tb = jnp.full((B,), args.midway_t, jnp.int32)
                    sample = diffusion.model_predictions(
                        model_fn, x_t, tb, img.astype(chdtype)).pred_x_start
                else:
                    # x_t is at noise level midway_t and ddim_from's first
                    # model call is at t_start - 1 -> pass midway_t + 1
                    # (ADVICE r4 off-by-one fix; same in sample.py)
                    sample = diffusion.ddim_from(
                        model_fn, x_t, args.midway_t + 1, args.ddim_steps,
                        key, img.astype(chdtype))
            elif args.sampler == "ancestral":
                # full conditional generation from noise — on-distribution at
                # every step (diag_sampler2: beats the halfway chain)
                sample = diffusion.p_sample_loop(
                    model_fn, chain_img.shape, key, img.astype(chdtype))
            else:  # ddim
                sample = diffusion.ddim_sample(
                    model_fn, chain_img.shape, key, img.astype(chdtype),
                    sampling_timesteps=args.midway_t)
            sample = sample.astype(jnp.float32)
            # decode with the TRAINING contract in_dec = pred_x_start * 18
            # (model.py x_hat path).  The reference's shipped sampler decodes
            # the /18-space sample raw (srcs/sample.py:131; its intended
            # descale survives only as the commented line 100) — a latent
            # defect we do not reproduce here.
            return model.apply(vd, sample * args.global_scale, method="decode")

        x_hat = np.asarray(decode(vars_diff, vars_codec, x, jax.random.PRNGKey(0)))
        if args.time_decode:
            # matched-cost RTF: time the jitted decode AFTER the compile
            # above; median of 3 runs, audio-seconds / wall-second
            import time as _time
            ts = []
            for _ in range(3):
                t0 = _time.perf_counter()
                jax.block_until_ready(
                    decode(vars_diff, vars_codec, x, jax.random.PRNGKey(0)))
                ts.append(_time.perf_counter() - t0)
            audio_s = x.shape[0] * x.shape[1] / 16000.0
            print(f"decode RTF ({args.sampler}, midway_t={args.midway_t}): "
                  f"{audio_s / sorted(ts)[1]:.1f}x real-time "
                  f"({audio_s:.1f} audio-s / {sorted(ts)[1]*1e3:.0f} ms)")
        # per-example ENERGY (RMS) alignment like the reference sampler output
        # normalization (srcs/sample.py:131-134); SI-SNR is scale-invariant,
        # mel distance is not, so align first.  NOTE: round-2 used the
        # projection gain <ref,est>/<est,est> here, which goes to ~0 when the
        # output is phase-decorrelated from the reference (generative decodes
        # are) and zeroed the signal -> mel vs silence.  RMS alignment only
        # equalizes energy and cannot cancel the signal.
        ref = np.asarray(x)[..., 0]
        est = x_hat[..., 0]
        gain = np.sqrt(
            (ref * ref).sum(-1, keepdims=True)
            / ((est * est).sum(-1, keepdims=True) + 1e-8))
        est_aligned = est * gain
        label = {
            "halfway": f"{args.midway_t}-step halfway",
            "sdedit": f"{args.midway_t}-step sdedit",
            "ancestral": "1000-step ancestral from noise",
            "ddim": f"{args.midway_t}-step DDIM from noise",
            "onestep": f"onestep-x0 @t={args.midway_t}",
            "ddim_deq": f"ddim-deq t={args.midway_t} x{args.ddim_steps}",
        }[args.sampler]
        if args.chain_start == "reencode" and args.sampler in (
                "halfway", "sdedit", "onestep", "ddim_deq"):
            label += ", reencode start"
        rows.append((
            f"diffusion de-qtz @{bw} kbps ({label})",
            si_snr(ref, est),
            mel_l1(x, jnp.asarray(est_aligned)[..., None]),
            stoi_batch(ref, est),
        ))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec", default="")
    ap.add_argument("--ae", default="")
    ap.add_argument("--diff", default="")
    ap.add_argument("--data", default="data_synth")
    # 1.2 s = the UNet's training clip length.  The old 2.4 s default
    # evaluated stage-3 at twice the only length it ever trained on
    # (round-3 protocol-mismatch finding; VERDICT r3 weak #6) — retired.
    ap.add_argument("--seconds", type=float, default=1.2)
    ap.add_argument("--n_files", type=int, default=32)
    ap.add_argument("--midway_t", type=int, default=100)
    ap.add_argument("--sampler",
                    choices=["halfway", "sdedit", "ancestral", "ddim",
                             "onestep", "ddim_deq"],
                    default="halfway",
                    help="halfway = reference production chain from the "
                         "upsampled cond; ancestral/ddim = conditional "
                         "generation from noise (ddim uses midway_t steps); "
                         "onestep/ddim_deq = DETERMINISTIC dequantization "
                         "from the chain start treated as x_t at midway_t "
                         "(onestep: single x0 prediction; ddim_deq: eta=0 "
                         "ddim_from over the last midway_t levels in "
                         "--ddim_steps calls)")
    ap.add_argument("--ddim_steps", type=int, default=8,
                    help="model calls for --sampler ddim_deq")
    ap.add_argument("--time_decode", action="store_true",
                    help="also print the post-compile decode RTF (median of "
                         "3) for the matched-cost sampler table")
    ap.add_argument("--chain_start", choices=["cond", "reencode"],
                    default="cond",
                    help="halfway/sdedit start: upsampled cond (reference) or "
                         "re-encoded codec audio (bitstream-only, much closer "
                         "to the target latent)")
    ap.add_argument("--cond_bandwidth", type=float, default=1.5)
    ap.add_argument("--global_scale", type=float, default=None,
                    help="default: the value persisted in the diff "
                         "checkpoint's config.json, else 18.0")
    ap.add_argument("--data_std", type=float, default=None,
                    help="SNR-shift divisor (must match training); default: "
                         "the diff checkpoint's config.json, else 1.0")
    ap.add_argument("--diff_objective", default=None,
                    help="model output parameterization (must match "
                         "training); default: the diff checkpoint's "
                         "config.json, else pred_noise.  Round-4 bugfix: "
                         "this was silently pred_noise while r6+ checkpoints "
                         "train pred_x0, which made model_predictions "
                         "misread the network output and tanked every "
                         "eval_quality diffusion row")
    ap.add_argument("--chain_dtype", choices=["float32", "bfloat16"],
                    default="float32", help="denoise-chain carry dtype")
    ap.add_argument("--ae_ratios", nargs="+", type=int, default=[8, 4])
    ap.add_argument("--upsampling_ratios", nargs="+", type=int, default=[5, 2])
    args = ap.parse_args()

    if args.global_scale is None or args.data_std is None or args.diff_objective is None:
        from ladiffcodec_tpu.utils.checkpoint import load_run_config

        cfg = load_run_config(args.diff) if args.diff else {}
        if args.global_scale is None:
            args.global_scale = float(cfg.get("global_scale", 18.0))
        if args.data_std is None:
            args.data_std = float(cfg.get("data_std", 1.0))
        if args.diff_objective is None:
            args.diff_objective = cfg.get("diff_objective", "pred_noise")
        if args.diff:
            print(f"global_scale = {args.global_scale}  data_std = "
                  f"{args.data_std}  objective = {args.diff_objective} "
                  f"({'config.json' if cfg else 'reference default'})")

    rows = []
    vars_codec = None
    if args.codec:
        vars_codec = eval_codec(args, rows)
    if args.ae:
        eval_ae(args, rows)
    if args.diff:
        assert vars_codec is not None, "--diff needs --codec for conditioning"
        eval_diffusion(args, rows, vars_codec)

    print(f"\n{'config':<48} {'SI-SNR dB':>10} {'mel L1+L2':>10} {'STOI':>6}")
    for name, snr, mel, st in rows:
        print(f"{name:<48} {snr:>10.2f} {mel:>10.3f} {st:>6.3f}")


if __name__ == "__main__":
    main()
