"""ONE-COMMAND production demo (VERDICT r4 item 5): the full LaDiffCodec
deployment pipeline over the tracked weights —

  wav --[codec encode + LM arithmetic coding]--> .ecdc bytes
      --[LM decode]--> RVQ codes
      --[codec decode]--> codec wav          (the baseline the dequantizer must beat)
      --[re-encode -> onestep-x0 @t -> hop-8 decode]--> de-quantized wav

and logs, per stage: wall-clock RTF, the effective bitrate of the LM stream,
and quality (SI-SNR / mel / STOI) of BOTH decodes against the input.  This is
the UX of the reference's srcs/encodec/__main__.py:80-119 composed with its
srcs/sample.py:130 capability, as one pipeline on one command:

  python scripts/demo_e2e.py \
      --codec saved_models/stage1_codec_nodisc_r4/model_best \
      --diff  saved_models/stage3_diff_r9/model_best \
      --lm    saved_models/lm/model_best --out outputs/demo/

Runs on the TPU; first run compiles (~minutes, then cached in .jax_cache).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ladiffcodec_tpu.bitstream.compress import ensure_host_cpu_backend

ensure_host_cpu_backend()  # LM step off-tunnel (resolve_lm_device "auto")

import jax
import jax.numpy as jnp

from ladiffcodec_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()

from ladiffcodec_tpu.models.diff_rep import DiffAudioRep
from ladiffcodec_tpu.models.streaming_transformer import LMModel
from ladiffcodec_tpu.bitstream.ladiff_adapter import LaDiffBitstreamModel
from ladiffcodec_tpu.bitstream.compress import compress, decompress
from ladiffcodec_tpu.data.librispeech import DatasetLibri
from ladiffcodec_tpu.utils.checkpoint import load_checkpoint_path, load_run_config
from ladiffcodec_tpu.losses.losses_fn import melspec_loss_fn
from ladiffcodec_tpu.losses.stoi import stoi_batch
from ladiffcodec_tpu.quantization.core import RVQState, rvq_decode


def si_snr(ref, est, eps=1e-8):
    ref = ref - ref.mean(-1, keepdims=True)
    est = est - est.mean(-1, keepdims=True)
    dot = np.sum(ref * est, -1, keepdims=True)
    s = dot * ref / (np.sum(ref**2, -1, keepdims=True) + eps)
    e = est - s
    return float(np.mean(10 * np.log10(
        np.sum(s**2, -1) / (np.sum(e**2, -1) + eps) + eps)))


def load_codec_vars(path):
    raw = load_checkpoint_path(None, path)
    state = raw["quantizer"]["state"]
    if isinstance(state, dict):
        state = RVQState(**{k: jnp.asarray(v) for k, v in state.items()})
    return {"params": raw["params"], "quantizer": {"state": state}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec", required=True)
    ap.add_argument("--diff", required=True)
    ap.add_argument("--lm", default="", help="LM checkpoint; empty = fixed-width packing")
    ap.add_argument("--data", default="data_synth")
    ap.add_argument("--n_files", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--bandwidth", type=float, default=1.5)
    ap.add_argument("--midway_t", type=int, default=160)
    ap.add_argument("--chain_dtype", choices=["float32", "bfloat16"],
                    default="bfloat16")
    ap.add_argument("--out", default="", help="write input/codec/dequant wavs here")
    args = ap.parse_args()

    # ---- models -------------------------------------------------------
    cvars = load_codec_vars(args.codec)
    codec = DiffAudioRep(rep_dims=128, n_filters=32, lstm=2,
                         enc_ratios=(8, 5, 4, 2), quantization=True,
                         bandwidth=args.bandwidth)
    bmodel = LaDiffBitstreamModel(codec)
    K = codec._bw_n_q()

    cfg = load_run_config(args.diff)
    gs = float(cfg.get("global_scale", 18.0))
    data_std = float(cfg.get("data_std", 1.0))
    objective = cfg.get("diff_objective", "pred_noise")
    print(f"diff config: global_scale={gs} data_std={data_std} objective={objective}")
    diffm = DiffAudioRep(
        rep_dims=128, diff_dims=128, n_filters=32, lstm=2, enc_ratios=(8,),
        run_diff=True, model_type="unet", scaling_global=True, global_scale=gs,
        data_std=data_std, diff_objective=objective, other_cond=True,
        cond_channels=128, upsampling_ratios=(5, 4, 2), unet_scale_cond=True)
    draw = load_checkpoint_path(None, args.diff)
    dvars = {"params": draw["params"]}

    lm = lm_vars = None
    if args.lm:
        lm = LMModel(n_q=K, card=codec.bins, dim=200, num_layers=5)
        lm_raw = load_checkpoint_path(None, args.lm)
        lm_vars = {"params": lm_raw["params"]}

    chdtype = jnp.bfloat16 if args.chain_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def deq_decode(vd, vc, codes):
        """RECEIVER tail: bitstream codes -> de-quantized waveform.  Conditions
        on the exact decoded codes (no re-quantization drift); chain start is
        the re-encoded codec decode (production onestep path, BASELINE r4)."""
        cond = codec.apply(vc, codes,
                           method=lambda m, c: rvq_decode(m.rvq_embed.value, c))
        raw = diffm.apply(vd, cond,
                          method=lambda m, c: m.diff_model.cond_upsampler(c))
        B = raw.shape[0]
        img = raw / (jnp.max(jnp.abs(raw.reshape(B, -1)), 1)[:, None, None] + 1e-8)
        codec_wav = codec.apply(vc, codes, method="decode_codes")
        start = diffm.apply(vd, codec_wav, method="encode") / gs
        diffusion = diffm.diffusion
        ab = diffusion.schedule.alphas_cumprod

        def model_fn(z, t, c):
            out = diffm.apply(vd, z.astype(chdtype), t, c.astype(chdtype),
                              True, method="diff_model_fn")
            return out.astype(chdtype)

        x_t = (jnp.sqrt(ab[args.midway_t]) * start).astype(chdtype)
        tb = jnp.full((B,), args.midway_t, jnp.int32)
        sample = diffusion.model_predictions(
            model_fn, x_t, tb, img.astype(chdtype)).pred_x_start
        wav = diffm.apply(vd, sample.astype(jnp.float32) * gs, method="decode")
        return wav, codec_wav

    # ---- pipeline over dev files ---------------------------------------
    ds = DatasetLibri("eval", args.seconds, args.data, 16000)
    n = min(args.n_files, len(ds))
    L = (int(args.seconds * 16000) // 640) * 640

    tot = dict(bytes=0, t_comp=0.0, t_ecdc_dec=0.0, t_deq=0.0, secs=0.0)
    refs, codec_outs, deq_outs = [], [], []
    use_lm = bool(args.lm)
    for i in range(n):
        x = np.asarray(ds[i])[:L]
        refs.append(x)
        xr = x.reshape(1, -1)

        t0 = time.perf_counter()
        data = compress(bmodel, cvars, xr, use_lm=use_lm, lm=lm, lm_vars=lm_vars)
        t1 = time.perf_counter()
        _, sr, frames = decompress(data, variables=cvars, model=bmodel,
                                   lm=lm, lm_vars=lm_vars, return_frames=True)
        t2 = time.perf_counter()
        codes = jnp.asarray(frames[0][0].transpose(1, 0, 2))  # (K, 1, T)
        deq, cwav = deq_decode(dvars, cvars, codes)
        deq, cwav = jax.block_until_ready((deq, cwav))
        t3 = time.perf_counter()

        codec_outs.append(np.asarray(cwav)[0, :L, 0])
        deq_outs.append(np.asarray(deq)[0, :L, 0])
        tot["bytes"] += len(data)
        if i > 0:  # first file pays the jit compiles; keep it out of the RTFs
            tot["t_comp"] += t1 - t0
            tot["t_ecdc_dec"] += t2 - t1
            tot["t_deq"] += t3 - t2
            tot["secs"] += L / 16000.0

    ref = np.stack(refs)
    cw = np.stack(codec_outs)
    dw = np.stack(deq_outs)
    # energy-align for the mel distance (phase-decorrelated generative decode)
    def align(est):
        g = np.sqrt((ref * ref).sum(-1, keepdims=True)
                    / ((est * est).sum(-1, keepdims=True) + 1e-8))
        return est * g

    def mel(est):
        # melspec_loss_fn sums over the batch (the eval_quality tables are
        # always 32-file sums); report PER-FILE here so the number does not
        # scale with --n_files
        return float(melspec_loss_fn(
            jnp.asarray(ref)[..., None], jnp.asarray(est)[..., None],
            range(5, 12))) / ref.shape[0]

    secs_all = ref.shape[0] * L / 16000.0
    kbps = tot["bytes"] * 8 / secs_all / 1000.0

    mode = "LM arithmetic" if use_lm else "fixed-width"
    print(f"\n=== demo_e2e: {n} x {L/16000.0:.1f}s files @ {args.bandwidth} "
          f"kbps target, {mode} coding, onestep t={args.midway_t} ===")
    print(f"effective bitrate : {kbps:.3f} kbps")
    if tot["secs"] > 0:
        print(f"sender   (wav -> .ecdc)          : {tot['secs']/tot['t_comp']:7.1f}x RT")
        print(f"receiver (.ecdc -> codes -> wav) : {tot['secs']/tot['t_ecdc_dec']:7.1f}x RT (entropy decode + codec)")
        print(f"receiver (codes -> dequant wav)  : {tot['secs']/tot['t_deq']:7.1f}x RT (diffusion tail)")
        print(f"receiver total                   : {tot['secs']/(tot['t_ecdc_dec']+tot['t_deq']):7.1f}x RT")
    print(f"\n{'decode':<14} {'SI-SNR dB':>10} {'mel':>8} {'STOI':>6}")
    print(f"{'codec':<14} {si_snr(ref, cw):>10.2f} {mel(align(cw)):>8.3f} "
          f"{stoi_batch(ref, cw):>6.3f}")
    print(f"{'de-quantized':<14} {si_snr(ref, dw):>10.2f} {mel(align(dw)):>8.3f} "
          f"{stoi_batch(ref, dw):>6.3f}")

    if args.out:
        from ladiffcodec_tpu.data.audio_io import write_wav
        os.makedirs(args.out, exist_ok=True)
        for i in range(n):
            for tag, w in (("ref", ref[i]), ("codec", cw[i]), ("deq", dw[i])):
                y = w / (np.max(np.abs(w)) + 1e-8)
                write_wav(os.path.join(args.out, f"{i}_{tag}.wav"), y, 16000)
        print(f"wavs -> {args.out}")


if __name__ == "__main__":
    main()
