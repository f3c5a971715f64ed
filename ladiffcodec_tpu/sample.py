"""Batch inference CLI (`python -m ladiffcodec_tpu.sample`; reference
srcs/sample.py): walk input_dir/**/*.wav, encode with the conditioning codec,
de-quantize with `halfway_sampling` (100 ancestral steps from the upsampled
condition — sample.py:69,130), decode, normalize, write 16 kHz wavs.

TPU notes:
  * the whole decode path (cond upsampling + 100-step scan + decoder) is one
    jitted function, compiled once per padded length bucket (lengths are
    rounded up to a multiple of `--bucket_s` seconds, so arbitrary-length
    files hit a handful of compilations instead of one each);
  * the condition is processed ONCE, not once per denoise step;
  * `--sampler ddim --sampling_timesteps K` exposes the K-step truncated DDIM
    fast path (the "50-step DDIM decode" of BASELINE.json).
"""

from __future__ import annotations

import argparse
import glob
import os
import typing as tp
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .models.diff_rep import DiffAudioRep, DiffAudioTime
from .data.audio_io import read_wav, write_wav, resample
from .utils.checkpoint import load_checkpoint_path, load_model_variables
from .train import build_cond_model


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="ladiffcodec_tpu sampler")
    parser.add_argument("--data_folder_path", type=str, default="")
    parser.add_argument("--n_spks", type=int, default=500)
    parser.add_argument("--seq_len_in_sec", type=float, default=1.8)
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--model_path", type=str, default="")
    parser.add_argument("--qtzer_path", type=str, default="")
    parser.add_argument("--note", type=str, default="")
    parser.add_argument("--rep_dims", type=int, default=128)
    parser.add_argument("--emb_dims", type=int, default=128)
    parser.add_argument("--quantization", action="store_true")
    parser.add_argument("--bandwidth", type=float, default=3.0)
    parser.add_argument("--n_filters", type=int, default=32)
    parser.add_argument("--lstm", type=int, default=2)
    parser.add_argument("--n_residual_layers", type=int, default=1)
    parser.add_argument("--enc_ratios", nargs="+", type=int, default=[8])
    parser.add_argument("--final_activation", type=str, default=None)
    parser.add_argument("--run_diff", action="store_true")
    parser.add_argument("--run_vae", action="store_true")
    parser.add_argument("--train_time_diff", action="store_true")
    parser.add_argument("--diff_dims", type=int, default=256)
    parser.add_argument("--qtz_condition", action="store_true")
    parser.add_argument("--self_condition", action="store_true")
    parser.add_argument("--seq_length", type=int, default=16000)
    parser.add_argument("--model_type", type=str, default="unet")
    parser.add_argument("--scaling_frame", action="store_true")
    parser.add_argument("--scaling_feature", action="store_true")
    parser.add_argument("--scaling_global", action="store_true")
    parser.add_argument("--global_scale", type=float, default=18.0)
    parser.add_argument("--data_std", type=float, default=1.0,
                        help="per-element std of the scaled latent; SNR-shifts "
                             "the schedule by 1/data_std (must match training)")
    parser.add_argument("--diff_objective", type=str, default="pred_noise",
                        choices=["pred_noise", "pred_x0", "pred_v"],
                        help="diffusion parameterization (must match training)")
    parser.add_argument("--scaling_dim", action="store_true")
    parser.add_argument("--sampling_timesteps", type=int, default=1000)
    parser.add_argument("--use_film", action="store_true")
    parser.add_argument("--model_for_cond", type=str, default="")
    parser.add_argument("--upsampling_ratios", nargs="+", type=int, default=[5, 4, 2])
    parser.add_argument("--cond_enc_ratios", nargs="+", type=int, default=[8, 5, 4, 2])
    parser.add_argument("--cond_bandwidth", type=float, default=3.0)
    parser.add_argument("--cond_global", type=float, default=3.0)
    parser.add_argument("--unet_scale_cond", action="store_true")
    parser.add_argument("--unet_scale_x", action="store_true")
    parser.add_argument("--input_dir", type=str, default="")
    parser.add_argument("--output_dir", type=str, default="outputs/")
    # TPU-native extras
    parser.add_argument("--midway_t", type=int, default=100)
    parser.add_argument(
        "--sampler", type=str, default="halfway",
        choices=["halfway", "sdedit", "ddim", "full", "infilling",
                 "onestep", "ddim_deq"],
        help="halfway = reference production path (sample.py:130); sdedit = "
             "halfway with the chain start q_sample-noised to midway_t "
             "(on-distribution start); ddim = truncated fast path; full = "
             "ancestral from noise (reference's commented-out alternative, "
             "sample.py:98-105); infilling = reference sample.py:107-122; "
             "onestep/ddim_deq = DETERMINISTIC dequantization — the chain "
             "start is treated as x_t at midway_t (its only 'noise' is the "
             "codec error), so no fresh noise is injected: onestep = single "
             "x0 prediction, ddim_deq = eta=0 ddim_from over the last "
             "midway_t levels in --sampling_timesteps calls (diag_sampler5; "
             "pairs naturally with --chain_start reencode)",
    )
    parser.add_argument("--infill_lam", type=float, default=0.1)
    parser.add_argument(
        "--chain_start", type=str, default="cond",
        choices=["cond", "reencode"],
        help="halfway/sdedit chain start: 'cond' = the max-abs-normalized "
             "upsampled condition (reference production, srcs/sample.py:125-"
             "129); 'reencode' = decode the codec audio and re-encode it with "
             "the frozen stage-2 encoder (bitstream-only information — the "
             "codec decode IS available wherever the bitstream is).  The "
             "re-encoded latent starts the chain ~45 dB closer to the target "
             "than the upsampled cond (diag_sampler3), so low-t sdedit can "
             "clean codec artifacts instead of regenerating from scratch",
    )
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"],
                        help="activation dtype for the denoiser/decoder "
                             "(params stay float32; schedule math stays f32)")
    parser.add_argument("--param_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="cast model weights for decode (bfloat16 halves "
                             "weight HBM reads in the denoise scan)")
    parser.add_argument("--attn_layout", type=str, default="bthd",
                        choices=["bhtd", "bthd"],
                        help="UNet attention tensor layout: bthd keeps "
                             "(B,T,H,D) end-to-end (no head-split transposes)")
    parser.add_argument("--chain_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="dtype of the denoise-scan carry and its "
                             "elementwise posterior math (bfloat16 halves the "
                             "HBM traffic of the ~10 per-step elementwise ops; "
                             "schedule tables stay f32 either way)")
    parser.add_argument("--no_descale_latent", dest="descale_latent",
                        action="store_false", default=True,
                        help="reproduce the reference sampler's raw decode of "
                             "the /18-space sample (srcs/sample.py:131) "
                             "instead of the training contract decoder(z*18)")
    parser.add_argument("--img_scale", type=float, default=1.0,
                        help="multiply the halfway-chain start image by this "
                             "latent-scale constant.  The reference's global "
                             "18.0 normalizes ITS encoder's latents to ~unit "
                             "max-abs so img at 1.0 is on-distribution "
                             "(sample.py:125-129); a model whose latents/18 "
                             "sit at a different max-abs needs that value "
                             "here (measure: max|encode(x)/18| on train data)")
    parser.add_argument("--bucket_s", type=float, default=0.0,
                        help="pad files up to multiples of this many seconds "
                             "to bound recompilation (0 = exact lengths)")
    parser.add_argument("--decode_batch", type=int, default=1,
                        help="decode this many same-bucket files per device "
                             "call (throughput peaks around 16 on v5e)")
    parser.add_argument("--segment_s", type=float, default=0.0,
                        help="decode in fixed segments of this many seconds "
                             "with 1%% triangle-crossfade overlap-add (one "
                             "compiled shape for ANY file length; the EnCodec "
                             "long-audio strategy applied to the diffusion "
                             "path). 0 = whole-file decode")
    return parser


# model-construction flags that the trainer persists in config.json and the
# sampler can safely inherit (anything NOT passed explicitly on this CLI)
_CONFIG_KEYS = (
    "rep_dims", "emb_dims", "diff_dims", "n_filters", "lstm",
    "n_residual_layers", "enc_ratios", "quantization", "bandwidth",
    "run_diff", "run_vae", "model_type", "scaling_frame", "scaling_feature",
    "scaling_global", "scaling_dim", "global_scale", "data_std",
    "diff_objective", "use_film",
    "cond_global", "upsampling_ratios", "cond_enc_ratios", "cond_bandwidth",
    "unet_scale_cond", "unet_scale_x", "qtz_condition", "self_condition",
    "final_activation", "train_time_diff", "sample_rate",
)


def apply_run_config(inp_args, parser, argv=None) -> None:
    """Inherit model-construction flags from the checkpoint's persisted
    `config.json` (written by the trainer) for every flag the user did not
    set explicitly on this command line.  Closes the ADVICE-r2 footgun where
    a model trained with a non-default `--global_scale` silently decodes
    off-distribution unless the flag is repeated everywhere."""
    if not inp_args.model_path:
        return
    from .utils.checkpoint import load_run_config

    cfg = load_run_config(inp_args.model_path)
    if not cfg:
        return
    import sys

    argv = list(sys.argv[1:]) if argv is None else list(argv)
    explicit = {a.split("=")[0].lstrip("-").replace("-", "_")
                for a in argv if a.startswith("--")}
    inherited = []
    for key in _CONFIG_KEYS:
        if key in cfg and key not in explicit and hasattr(inp_args, key):
            val = cfg[key]
            if val is None:
                continue  # trainer left it unset; keep this CLI's default
            if getattr(inp_args, key) != val:
                setattr(inp_args, key, val)
                inherited.append(f"{key}={val}")
    if inherited:
        print(f"[config.json] inherited: {', '.join(inherited)}")


def build_main_model(inp_args) -> DiffAudioRep:
    other_cond = bool(inp_args.model_for_cond)
    cls = DiffAudioTime if inp_args.train_time_diff else DiffAudioRep
    kwargs = dict(
        rep_dims=inp_args.rep_dims,
        emb_dims=inp_args.emb_dims,
        diff_dims=inp_args.diff_dims,
        self_condition=inp_args.self_condition,
        qtz_condition=inp_args.qtz_condition,
        other_cond=other_cond,
        seq_length=inp_args.seq_length,
        model_type=inp_args.model_type,
        scaling_frame=inp_args.scaling_frame,
        scaling_feature=inp_args.scaling_feature,
        scaling_global=inp_args.scaling_global,
        global_scale=inp_args.global_scale,
        scaling_dim=inp_args.scaling_dim,
        use_film=inp_args.use_film,
        cond_global=inp_args.cond_global,
        cond_channels=inp_args.rep_dims,
        upsampling_ratios=tuple(inp_args.upsampling_ratios) if inp_args.upsampling_ratios else None,
        unet_scale_x=inp_args.unet_scale_x,
        unet_scale_cond=inp_args.unet_scale_cond,
        sampling_timesteps=inp_args.sampling_timesteps,
        attn_layout=getattr(inp_args, "attn_layout", "bthd"),
        data_std=getattr(inp_args, "data_std", 1.0),
        diff_objective=getattr(inp_args, "diff_objective", "pred_noise"),
    )
    if inp_args.train_time_diff:
        return DiffAudioTime(**{k: v for k, v in kwargs.items() if k in DiffAudioTime.__dataclass_fields__})
    return DiffAudioRep(
        n_residual_layers=inp_args.n_residual_layers,
        n_filters=inp_args.n_filters,
        lstm=inp_args.lstm,
        quantization=inp_args.quantization,
        bandwidth=inp_args.bandwidth,
        enc_ratios=tuple(inp_args.enc_ratios),
        run_diff=inp_args.run_diff,
        run_vae=inp_args.run_vae,
        final_activation=inp_args.final_activation,
        **kwargs,
    )


def make_decode_fn(model, variables, cond_model, cond_vars, inp_args, normalize=True):
    """One jitted function: wav -> cond codec -> diffusion decode -> wav."""

    if getattr(inp_args, "param_dtype", "float32") == "bfloat16":
        # bf16 weights halve the weight HBM traffic of the denoise scan;
        # norm statistics still accumulate in f32 inside the modules
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables,
        )

    @partial(jax.jit, static_argnums=(2,))
    def decode(wav: jnp.ndarray, key: jax.Array, midway_t: int):
        cond = cond_model.apply(cond_vars, wav, method="get_cond")
        # upsample through the cond stack, then flat max-abs normalize
        # (reference sample.py:125-129)
        raw = model.apply(
            variables, cond, method=lambda m, c: m.diff_model.cond_upsampler(c)
        )
        B = raw.shape[0]
        img = raw / (jnp.max(jnp.abs(raw.reshape(B, -1)), axis=1)[:, None, None] + 1e-8)
        cond_p = img if inp_args.unet_scale_cond else raw
        diffusion = model.diffusion
        cdtype = jnp.bfloat16 if inp_args.compute_dtype == "bfloat16" else jnp.float32
        chdtype = (jnp.bfloat16
                   if getattr(inp_args, "chain_dtype", "float32") == "bfloat16"
                   else jnp.float32)

        def model_fn(x, t, c):
            out = model.apply(
                variables, x.astype(cdtype), t, c.astype(cdtype), True,
                method="diff_model_fn",
            )
            return out.astype(chdtype)

        if getattr(inp_args, "chain_start", "cond") == "reencode":
            # bitstream-only chain start: codec decode -> frozen stage-2
            # encode -> /global_scale puts the start on the scaled-latent
            # distribution the denoiser trained on (diag_sampler3)
            codec_wav = cond_model.apply(cond_vars, cond, method="decode")
            start = model.apply(variables, codec_wav.astype(cdtype), method="encode")
            gs = inp_args.global_scale if inp_args.scaling_global else 1.0
            start = start.astype(jnp.float32) / gs
            chain_img = (start * inp_args.img_scale).astype(chdtype)
        else:
            chain_img = (img * inp_args.img_scale).astype(chdtype)
        cond_p = cond_p.astype(chdtype)
        if inp_args.sampler == "ddim":
            sample = diffusion.ddim_from(
                model_fn, chain_img, midway_t, inp_args.sampling_timesteps, key, cond_p
            )
        elif inp_args.sampler == "sdedit":
            # noise-matched halfway: q_sample the chain start to midway_t
            # first, so the reverse chain begins ON the forward-process
            # distribution instead of at the raw (imperfect) cond prediction
            key, kn = jax.random.split(key)
            tt = jnp.full((B,), midway_t, jnp.int32)
            noised = diffusion.q_sample(
                chain_img.astype(jnp.float32), tt,
                jax.random.normal(kn, chain_img.shape, jnp.float32),
            ).astype(chdtype)
            sample = diffusion.halfway_sampling(model_fn, noised, midway_t, key, cond_p)
        elif inp_args.sampler in ("onestep", "ddim_deq"):
            # deterministic dequantization (diag_sampler5 / eval_quality):
            # feed sqrt(alpha_bar[t]) * chain_img as x_t — no noise added,
            # nothing stochastically regenerated; the model projects the
            # codec error off the latent as if it were forward noise
            ab = diffusion.schedule.alphas_cumprod
            x_t = (jnp.sqrt(ab[midway_t]) * chain_img.astype(jnp.float32)
                   ).astype(chdtype)
            if inp_args.sampler == "onestep":
                tt = jnp.full((B,), midway_t, jnp.int32)
                sample = diffusion.model_predictions(
                    model_fn, x_t, tt, cond_p).pred_x_start
            else:
                # x_t is constructed at noise level midway_t; ddim_from makes
                # its first model call at t = t_start - 1, so pass
                # midway_t + 1 to keep the told-t equal to the built-t
                # (ADVICE r4: one-level mismatch otherwise)
                sample = diffusion.ddim_from(
                    model_fn, x_t, midway_t + 1, inp_args.sampling_timesteps,
                    key, cond_p)
        elif inp_args.sampler == "full":
            sample = diffusion.p_sample_loop(model_fn, img.shape, key, cond_p)
        elif inp_args.sampler == "infilling":
            sample = diffusion.infilling(
                model_fn, chain_img, cond_p, midway_t, key, lam=inp_args.infill_lam
            )
        else:
            sample = diffusion.halfway_sampling(model_fn, chain_img, midway_t, key, cond_p)
        sample = sample.astype(jnp.float32)
        if inp_args.descale_latent and inp_args.scaling_global:
            # decode with the training contract x_hat = decoder(sample * 18)
            # (model.py); the reference's shipped sampler feeds the /18-space
            # sample to the decoder raw (srcs/sample.py:131 — its intended
            # descale survives only as the commented-out line 100).
            sample = sample * inp_args.global_scale
        x_hat = model.apply(variables, sample.astype(cdtype), method="decode")
        x_hat = x_hat.astype(jnp.float32)
        if normalize:
            # per-example normalization (the reference normalizes per file,
            # sample.py:133-134; batched decode must not mix examples)
            B = x_hat.shape[0]
            flat = x_hat.reshape(B, -1)
            x_hat = x_hat / (jnp.std(flat, axis=1)[:, None, None] + 1e-8)
            flat = x_hat.reshape(B, -1)
            x_hat = x_hat / (jnp.max(jnp.abs(flat), axis=1)[:, None, None] + 1e-8)
        return x_hat

    return decode


def synthesis(inp_args) -> None:
    model = build_main_model(inp_args)
    L0 = (int(inp_args.seq_len_in_sec * 16000) // 640) * 640
    example = jnp.zeros((1, max(L0, 640), 1))

    cond_model = build_cond_model(inp_args, quantization=True)
    cond_vars = cond_model.init(jax.random.PRNGKey(1), example)
    if inp_args.model_for_cond:
        cond_vars = load_model_variables(cond_vars, inp_args.model_for_cond)
    example_cond = cond_model.apply(cond_vars, example, method="get_cond")

    variables = model.init(jax.random.PRNGKey(0), example, cond=example_cond)
    if inp_args.model_path:
        variables = load_model_variables(variables, inp_args.model_path)

    segmented = inp_args.segment_s > 0
    decode = make_decode_fn(
        model, variables, cond_model, cond_vars, inp_args, normalize=not segmented
    )

    key = jax.random.PRNGKey(1234)
    files = sorted(glob.glob(os.path.join(inp_args.input_dir, "**/*.wav"), recursive=True))

    if segmented:
        from .bitstream.encodec_model import linear_overlap_add

        seg_len = max(int(inp_args.segment_s * 16000) // 640 * 640, 640)
        stride = max(640, int(seg_len * 0.99) // 640 * 640)
        for wav_file in files:
            audio, sr = read_wav(wav_file)
            audio = resample(audio, sr, 16000)[0]
            length = max(len(audio) // 640 * 640, 640)
            audio = audio[:length]
            offsets = list(range(0, length, stride))
            segs = np.zeros((len(offsets), seg_len, 1), np.float32)
            for i, off in enumerate(offsets):
                part = audio[off : off + seg_len]
                segs[i, : len(part), 0] = part
            outs = []
            for i in range(0, len(offsets), max(inp_args.decode_batch, 1)):
                batch = segs[i : i + max(inp_args.decode_batch, 1)]
                key, sub = jax.random.split(key)
                outs.append(np.asarray(decode(jnp.asarray(batch), sub, inp_args.midway_t)))
            decoded = np.concatenate(outs, axis=0)[..., 0]  # (n_seg, seg_len)
            y = linear_overlap_add([decoded[i] for i in range(len(offsets))], stride)
            y = y[:length]
            y = y / (np.std(y) + 1e-8)
            y = y / (np.max(np.abs(y)) + 1e-8)
            local = wav_file[len(inp_args.input_dir):][: -4]
            save_path = inp_args.output_dir + local
            os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
            write_wav(save_path + ".wav", y, 16000)
            print(f"{wav_file} -> {save_path}.wav [{len(offsets)} segments]")
        return

    # group files by padded length so same-shape files share one compilation
    # and (with --decode_batch > 1) one device call
    def padded_len(length: int) -> int:
        if inp_args.bucket_s > 0:
            bucket = int(inp_args.bucket_s * 16000) // 640 * 640
            return ((length + bucket - 1) // bucket) * bucket
        return length

    loaded = []
    for wav_file in files:
        audio, sr = read_wav(wav_file)
        audio = resample(audio, sr, 16000)
        length = audio.shape[-1] // 640 * 640
        loaded.append((wav_file, audio[0, :length], padded_len(length)))

    groups: tp.Dict[int, list] = {}
    for item in loaded:
        groups.setdefault(item[2], []).append(item)

    for padded, items in sorted(groups.items()):
        for i in range(0, len(items), inp_args.decode_batch):
            chunk = items[i : i + inp_args.decode_batch]
            x = np.zeros((len(chunk), padded, 1), np.float32)
            for b, (_, audio, _) in enumerate(chunk):
                x[b, : len(audio), 0] = audio
            key, sub = jax.random.split(key)
            y = np.asarray(decode(jnp.asarray(x), sub, inp_args.midway_t))
            for b, (wav_file, audio, _) in enumerate(chunk):
                local = wav_file[len(inp_args.input_dir):][: -4]
                save_path = inp_args.output_dir + local
                os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
                write_wav(save_path + ".wav", y[b, : len(audio), 0], 16000)
                print(f"{wav_file} -> {save_path}.wav")


def resolve_chain_start(inp_args, raw_argv: tp.Sequence[str]) -> None:
    """Default --chain_start to 'reencode' for the dequantization samplers.

    The deq operating point is trained/evaluated on the re-encoded scaled
    latent; the flat max-abs-normalized cond prediction is off that
    distribution (ADVICE r4).  Mutates ``inp_args`` in place; an explicit
    ``--chain_start cond`` on the command line is honored with a warning.
    """
    if inp_args.sampler not in ("onestep", "ddim_deq"):
        return
    explicit = any(a.split("=")[0] == "--chain_start" for a in raw_argv)
    if not explicit and inp_args.chain_start == "cond":
        inp_args.chain_start = "reencode"
        print("[sampler] onestep/ddim_deq: chain_start defaulted to "
              "'reencode' (pass --chain_start cond to override)")
    elif inp_args.chain_start == "cond":
        print("[sampler] WARNING: onestep/ddim_deq with chain_start="
              "cond feeds a max-abs-normalized cond prediction as x_t, "
              "off the scaled-latent distribution the deq operating "
              "point is trained on; expect degraded output")


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    from .utils.compile_cache import setup_compile_cache

    setup_compile_cache()
    parser = get_parser()
    inp_args = parser.parse_args(argv)
    apply_run_config(inp_args, parser, argv)
    import sys

    resolve_chain_start(inp_args, list(sys.argv[1:]) if argv is None
                        else list(argv))
    synthesis(inp_args)


if __name__ == "__main__":
    main()
