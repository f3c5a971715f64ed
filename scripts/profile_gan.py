"""Stage-1 GAN step breakdown (VERDICT r1 weak item 4): where do the 219 ms
go?  Times gen_step / disc_step separately at the BASELINE config (batch 8 x
2 s), prints XLA cost-analysis FLOPs for each, and times the component
forwards (codec recon, disc forward, melspec loss) to attribute the gap.

  python scripts/profile_gan.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from ladiffcodec_tpu.models.diff_rep import DiffAudioRep
from ladiffcodec_tpu.models.msstftd import MultiScaleSTFTDiscriminator
from ladiffcodec_tpu.training import TrainState, make_gan_train_step, make_optimizer
from ladiffcodec_tpu.losses.losses_fn import melspec_loss_fn


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def flops(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca.get("flops", 0.0))
    except Exception as e:
        return float("nan")


def main():
    B, L = 8, 32000
    model = DiffAudioRep(
        rep_dims=128, n_filters=32, lstm=2, enc_ratios=(8, 5, 4, 2),
        quantization=True, bandwidth=3.0,
    )
    disc = MultiScaleSTFTDiscriminator(filters=32)
    x = jnp.asarray(np.random.RandomState(0).randn(B, L, 1).astype(np.float32) * 0.1)

    variables = model.init(jax.random.PRNGKey(0), x)
    disc_vars = disc.init(jax.random.PRNGKey(1), x)
    optimizer = make_optimizer(3e-4)
    disc_opt = optax.adam(3e-4, b1=0.5, b2=0.9)
    state = TrainState(
        step=jnp.asarray(0), params=variables["params"],
        quantizer=variables.get("quantizer", {}),
        opt_state=optimizer.init(variables["params"]),
        disc_params=disc_vars["params"],
        disc_opt_state=disc_opt.init(disc_vars["params"]),
    )

    gen_step, disc_step = make_gan_train_step(model, disc, optimizer, disc_opt)
    gen_step = jax.jit(gen_step)
    disc_step = jax.jit(disc_step)

    key = jax.random.PRNGKey(2)
    st2, _, x_hat = gen_step(state, x, key)
    jax.block_until_ready(x_hat)

    t_gen = timeit(lambda s, b, k: gen_step(s, b, k)[2], state, x, key)
    t_disc = timeit(lambda s, b, h: disc_step(s, b, h)[1], state, x, x_hat)
    print(f"gen_step : {t_gen*1e3:8.1f} ms   ({flops(gen_step, state, x, key)/1e9:.1f} GFLOP)")
    print(f"disc_step: {t_disc*1e3:8.1f} ms   ({flops(disc_step, state, x, x_hat)/1e9:.1f} GFLOP)")

    # component forwards
    recon = jax.jit(lambda v, xx: model.apply(v, xx, training=False, mutable=["quantizer"])[0][1]["x_hat"])
    t_recon = timeit(recon, variables, x)
    print(f"codec fwd (enc+RVQ+dec): {t_recon*1e3:8.1f} ms  ({flops(recon, variables, x)/1e9:.1f} GFLOP)")

    dfwd = jax.jit(lambda dv, xx: disc.apply(dv, xx)[0])
    t_dfwd = timeit(dfwd, disc_vars, x)
    print(f"disc fwd (3 STFT stacks): {t_dfwd*1e3:8.1f} ms  ({flops(dfwd, disc_vars, x)/1e9:.1f} GFLOP)")

    mel = jax.jit(lambda a, b: melspec_loss_fn(a, b, range(5, 12)))
    t_mel = timeit(mel, x, x)
    print(f"melspec loss (7 scales) : {t_mel*1e3:8.1f} ms  ({flops(mel, x, x)/1e9:.1f} GFLOP)")


if __name__ == "__main__":
    main()
