"""Benchmark: audio-seconds/second/chip (RTF) for encode + diffusion decode
at 1.5 kbps — the BASELINE.json headline metric.

The measured pipeline is the full production decode path of
`ladiffcodec_tpu.sample`: waveform -> hop-320 codec encoder -> RVQ @1.5 kbps
-> dequantize -> transposed-conv upsample to the hop-8 grid -> diffusion
sampler from the upsampled condition -> hop-8 continuous decoder ->
waveform.  Weights are randomly initialized (the reference repo publishes no
benchmark numbers to compare quality against — BASELINE.md); throughput is
architecture + compiler bound, not weight bound.

Three modes (--mode):
  ddim50      50-step truncated DDIM (headline; default)
  halfway100  100 ancestral halfway steps — the reference's EXACT production
              sampler (srcs/sample.py:130, ddpm_loss.py:370-385)
  onestep     the round-4 production de-quantization default (BASELINE.md
              round-4 section): codec decode -> hop-8 re-encode ->
              deterministic one-step-x0 projection at t=160 -> decode.
              One UNet call instead of 50/100 — the fastest AND
              best-measured-quality chain on r8 weights.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is RTF / 100 (the >=100x real-time north star from
BASELINE.json).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    # persistent compile cache: repeat bench runs skip the multi-minute
    # TPU compile of the 50/100-step sampler graph
    from ladiffcodec_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["ddim50", "halfway100", "onestep"],
                    default="ddim50")
    ap.add_argument("--batch", type=int, default=32,
                    help="default 32 with --microbatch 16: the round-5 sweep "
                         "(logs/bench_r5.txt) measured 120.96x vs 119.03x at "
                         "batch 16 and 108.47x at plain batch 32 — dispatch "
                         "amortizes over 32 while fusions keep their batch-16 "
                         "VMEM working set")
    ap.add_argument("--param_dtype", choices=["float32", "bfloat16"], default="float32",
                    help="bfloat16 halves weight HBM reads in the denoise scan")
    ap.add_argument("--attn_layout", choices=["bhtd", "bthd"], default="bthd",
                    help="bthd removes the attention head-split transposes")
    ap.add_argument("--chain_dtype", choices=["float32", "bfloat16"], default="bfloat16",
                    help="dtype of the denoise-scan carry + posterior math "
                         "(bf16 is the recorded headline config; sampler math "
                         "is parity-tested at both dtypes)")
    ap.add_argument("--microbatch", type=int, default=16,
                    help="split the batch into lax.map'd microbatches of "
                         "this size inside ONE dispatch (0 disables).  The "
                         "bf16[B,4800,384] fusion working sets spill VMEM "
                         "past batch 16 "
                         "(round-2 profile, ~8%%/example at 32); microbatch "
                         "16 keeps every fusion at its batch-16 working set "
                         "while amortizing dispatch over the full batch")
    ap.add_argument("--lower_only", action="store_true",
                    help="trace+lower the decode graph and exit (CPU-safe "
                         "smoke test; no backend compile, no measurement)")
    args = ap.parse_args()
    if args.lower_only:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized (e.g. under the test harness)

    from ladiffcodec_tpu.models.diff_rep import DiffAudioRep

    SR = 16000
    SECONDS = 2.4  # reference training clip length
    BATCH = args.batch  # throughput sweet spot measured on v5e (85x @16 vs 39x @4)
    STEPS = 50  # "50-step DDIM decode"
    L = int(SECONDS * SR) // 640 * 640

    dtype = jnp.bfloat16  # activations; params stay f32

    model = DiffAudioRep(
        rep_dims=128,
        diff_dims=128,
        n_filters=32,
        lstm=0,
        enc_ratios=(8,),
        run_diff=True,
        model_type="unet",
        scaling_global=True,
        other_cond=True,
        cond_channels=128,
        upsampling_ratios=(5, 4, 2),
        unet_scale_cond=True,
        attn_layout=args.attn_layout,
    )
    cond_model = DiffAudioRep(
        rep_dims=128,
        n_filters=32,
        lstm=2,
        enc_ratios=(8, 5, 4, 2),
        quantization=True,
        bandwidth=1.5,
        rvq_kmeans_init=False,
    )

    x = jnp.asarray(np.random.RandomState(0).randn(BATCH, L, 1).astype(np.float32) * 0.1)
    # init at batch 1: params are batch-independent; avoids compiling the
    # full training-shaped graphs twice
    x1 = x[:1]
    cond_vars = cond_model.init(jax.random.PRNGKey(1), x1)
    cond = cond_model.apply(cond_vars, x1, method="get_cond")
    variables = model.init(jax.random.PRNGKey(2), x1, cond=cond)

    diffusion = model.diffusion

    if args.param_dtype == "bfloat16":
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables,
        )

    def decode_body(variables, cond_vars, wav, key):
        c = cond_model.apply(cond_vars, wav, method="get_cond")
        raw = model.apply(variables, c, method=lambda m, cc: m.diff_model.cond_upsampler(cc))
        B = raw.shape[0]
        img = raw / (jnp.max(jnp.abs(raw.reshape(B, -1)), 1)[:, None, None] + 1e-8)

        chdtype = jnp.bfloat16 if args.chain_dtype == "bfloat16" else jnp.float32

        def model_fn(xx, tt, cc):
            out = model.apply(
                variables, xx.astype(dtype), tt, cc.astype(dtype), True,
                method="diff_model_fn",
            )
            return out.astype(chdtype)

        img = img.astype(chdtype)
        if args.mode == "halfway100":
            sample = diffusion.halfway_sampling(model_fn, img, 100, key, img)
        elif args.mode == "onestep":
            # production dequant chain (sample.py --sampler onestep
            # --chain_start reencode --midway_t 160): codec decode ->
            # frozen hop-8 re-encode -> /global_scale -> deterministic
            # one-step x0 projection at the codec-error-matched t
            codec_wav = cond_model.apply(cond_vars, c, method="decode")
            start = model.apply(variables, codec_wav.astype(dtype), method="encode")
            start = start.astype(jnp.float32) / model.global_scale
            x_t = (jnp.sqrt(diffusion.schedule.alphas_cumprod[160])
                   * start).astype(chdtype)
            tt = jnp.full((B,), 160, jnp.int32)
            sample = diffusion.model_predictions(model_fn, x_t, tt, img).pred_x_start
        else:
            sample = diffusion.ddim_from(model_fn, img, 100, STEPS, key, img)
        return model.apply(variables, sample.astype(dtype), method="decode")

    @jax.jit
    def decode(variables, cond_vars, wav, key):
        mb = args.microbatch
        if mb and mb < wav.shape[0]:
            assert wav.shape[0] % mb == 0, "batch must divide by --microbatch"
            k = wav.shape[0] // mb
            w = wav.reshape(k, mb, *wav.shape[1:])
            keys = jax.random.split(key, k)
            out = jax.lax.map(
                lambda args_: decode_body(variables, cond_vars, *args_),
                (w, keys))
            return out.reshape(wav.shape[0], *out.shape[2:])
        return decode_body(variables, cond_vars, wav, key)

    key = jax.random.PRNGKey(0)
    if args.lower_only:
        decode.lower(variables, cond_vars, x, key)
        print(json.dumps({"metric": f"lower_only({args.mode})", "value": 1,
                          "unit": "ok", "vs_baseline": 0}))
        return
    # compile + settle (two throwaway runs: first executes the fresh
    # executable, second absorbs any one-off host allocation)
    for w in range(2):
        y = decode(variables, cond_vars, x, jax.random.fold_in(key, 100 + w))
        jax.block_until_ready(y)

    # measure: min over k windows of n back-to-back dispatches.  Wall-clock
    # on this 1-CPU host includes whatever else the core is doing, which
    # made single-window captures drift 2-5% below the fresh-process median
    # (BENCH_r03/r04 vs logs/bench_variance.txt).  Timing noise here is
    # strictly additive, so the MIN window is the robust estimator of the
    # device-bound throughput.
    windows, iters = 5, 4
    dts = []
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            y = decode(variables, cond_vars, x,
                       jax.random.fold_in(key, w * iters + i))
        jax.block_until_ready(y)
        dts.append(time.perf_counter() - t0)

    audio_seconds = BATCH * SECONDS * iters
    rtf = audio_seconds / min(dts)
    desc = {
        "halfway100": "100-step ancestral halfway decode (reference production sampler)",
        "onestep": "one-step-x0 dequant decode (round-4 production default)",
        "ddim50": "50-step DDIM decode",
    }[args.mode]
    print(json.dumps({
        "metric": f"audio-sec/sec/chip (RTF), encode + {desc} @1.5kbps",
        "value": round(rtf, 2),
        "unit": "x realtime",
        "vs_baseline": round(rtf / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
