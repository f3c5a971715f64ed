"""Profile the UNet denoise forward on TPU: op-category time breakdown +
batch sweep + bf16-param variant (VERDICT r1 'what's weak' items 1/2).

The denoise forward is the whole decode cost (BASELINE.md); this script
answers where the non-MXU 46% goes and whether casting params to bf16 (half
the weight HBM traffic) or a different batch helps.

Usage:  python scripts/profile_unet.py [--trace_dir /tmp/unet_trace]
Prints one line per experiment + an op-category table parsed from the
profiler trace via jax.profiler.ProfileData.
"""

import argparse
import collections
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(batch, seconds=2.4):
    from ladiffcodec_tpu.models.diff_rep import DiffAudioRep

    model = DiffAudioRep(
        rep_dims=128, diff_dims=128, n_filters=32, lstm=0, enc_ratios=(8,),
        run_diff=True, model_type="unet", scaling_global=True, other_cond=True,
        cond_channels=128, upsampling_ratios=(5, 4, 2), unet_scale_cond=True,
    )
    L = int(seconds * 16000) // 640 * 640
    T = L // 8
    x = jnp.asarray(np.random.RandomState(0).randn(batch, T, 128).astype(np.float32))
    cond = jnp.asarray(np.random.RandomState(1).randn(batch, T, 128).astype(np.float32))
    # init only the denoise path (params are batch-independent)
    t0 = jnp.zeros((1,), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), x[:1], t0, cond[:1], True, method="diff_model_fn"
    )
    return model, variables, x, cond


def time_fn(fn, *args, iters=20):
    y = fn(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def denoise_fn(model, cast_params):
    dtype = jnp.bfloat16

    def fn(variables, z, t, c):
        if cast_params:
            variables = jax.tree.map(
                lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, variables
            )
        out = model.apply(
            variables, z.astype(dtype), t, c.astype(dtype), True,
            method="diff_model_fn",
        )
        return out.astype(jnp.float32)

    return jax.jit(fn)


def parse_trace(trace_dir):
    """Aggregate TPU op time by category from the newest xplane file."""
    from jax.profiler import ProfileData

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no xplane files found under", trace_dir)
        return
    data = ProfileData.from_file(paths[-1])
    cats = collections.Counter()
    names = collections.Counter()
    lines_seen = []
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            lines_seen.append(f"{plane.name}/{line.name}")
            # only the synchronous op timeline: async DMA lines and the
            # module-level "XLA Modules" events overlap compute and would
            # double-count
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = ev.duration_ns
                name = ev.name
                cats[categorize(name)] += dur
                names[name] += dur
    if not cats:
        print("no 'XLA Ops' line found; lines:", lines_seen[:20])
    total = sum(cats.values())
    if not total:
        print("trace parsed but no TPU events; planes:", [p.name for p in data.planes])
        return
    print(f"\n-- op-category breakdown ({total/1e6:.2f} ms total device time) --")
    for k, v in cats.most_common():
        print(f"{k:<28} {v/1e6:9.2f} ms  {100*v/total:5.1f}%")
    print("\n-- top 15 ops --")
    for k, v in names.most_common(15):
        print(f"{v/1e6:8.2f} ms  {k[:110]}")


def categorize(name):
    n = name.lower()
    if "conv" in n:
        return "convolution"
    if "dot" in n or "einsum" in n:
        return "dot/einsum"
    if "fusion" in n:
        return "fusion(elementwise/reduce)"
    if "reduce" in n:
        return "reduce"
    if "copy" in n or "transpose" in n or "reshape" in n:
        return "copy/transpose"
    if "convert" in n:
        return "convert"
    if "dynamic" in n or "slice" in n or "concat" in n or "pad" in n:
        return "slice/concat/pad"
    if "infeed" in n or "outfeed" in n:
        return "infeed/outfeed"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", default="/tmp/unet_trace")
    ap.add_argument("--seconds", type=float, default=2.4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--scan_steps", type=int, default=20,
                    help="time a lax.scan of N chained denoise steps (robust "
                         "against per-dispatch timing artifacts)")
    args = ap.parse_args()

    print("backend:", jax.default_backend(), jax.devices()[0])

    B = args.batch
    model, variables, x16, c16 = build(B, args.seconds)
    t = jnp.full((B,), 50, jnp.int32)
    fn = denoise_fn(model, cast_params=False)

    # scan-of-N timing: one dispatch, N sequential model calls — the same
    # structure the samplers use, immune to dispatch pipelining artifacts
    N = args.scan_steps
    dtype = jnp.bfloat16

    @jax.jit
    def scan_fn(variables, z, c):
        def body(carry, _):
            out = model.apply(
                variables, carry.astype(dtype), t, c.astype(dtype), True,
                method="diff_model_fn",
            )
            return out.astype(jnp.float32), None
        z, _ = jax.lax.scan(body, z, None, length=N)
        return z

    dt_scan = time_fn(scan_fn, variables, x16, c16, iters=3)
    print(f"scan of {N} denoise steps, batch{B}: {dt_scan*1e3:8.1f} ms "
          f"= {dt_scan/N*1e3:.3f} ms/step ({dt_scan/N/B*1e3:.4f} ms/example)")

    # trace the scan (one dispatch -> clean op timeline)
    y = scan_fn(variables, x16, c16); jax.block_until_ready(y)
    with jax.profiler.trace(args.trace_dir):
        y = scan_fn(variables, x16, c16)
        jax.block_until_ready(y)
    parse_trace(args.trace_dir)


if __name__ == "__main__":
    main()
