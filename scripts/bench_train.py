"""Training-step throughput on TPU (BASELINE.json configs 2/5).

Measures the full jitted optimization step (fwd+bwd+Adam+RVQ EMA, and for
stage 1 the MS-STFT discriminator pass): audio-seconds of training data
consumed per second per chip.
"""

import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp, optax

from ladiffcodec_tpu.models.diff_rep import DiffAudioRep
from ladiffcodec_tpu.models.msstftd import MultiScaleSTFTDiscriminator
from ladiffcodec_tpu.training import TrainState, make_train_step, make_gan_train_step, make_optimizer

SR = 16000
SECONDS = 2.4
B = 8
L = int(SECONDS * SR)

def bench(name, step, state, x, key, extra=None, iters=5):
    out = step(state, x, key)
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    for i in range(iters):
        out = step(state, x, jax.random.fold_in(key, i))
    jax.block_until_ready(out[1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.0f} ms/step = {B*SECONDS/dt:.1f} audio-sec/s/chip", flush=True)

# ---- stage 3: diffusion training step (seq_length 1200, hop-32 latent) ----
model = DiffAudioRep(rep_dims=128, diff_dims=128, n_filters=32, lstm=0, enc_ratios=(8, 4),
                     run_diff=True, model_type="unet", scaling_global=True, other_cond=True,
                     cond_channels=128, upsampling_ratios=(5, 2), unet_scale_cond=True,
                     seq_length=1200)
cond_model = DiffAudioRep(rep_dims=128, n_filters=32, lstm=2, enc_ratios=(8, 5, 4, 2),
                          quantization=True, bandwidth=1.5, rvq_kmeans_init=False)
x = jnp.asarray(np.random.RandomState(0).randn(B, L, 1).astype(np.float32) * 0.1)
cv = cond_model.init(jax.random.PRNGKey(1), x)
c0 = cond_model.apply(cv, x, method="get_cond")
v = model.init(jax.random.PRNGKey(2), x, cond=c0)
opt = make_optimizer(5e-4, freeze_ed=True)
state = TrainState(step=jnp.asarray(0), params=v["params"], quantizer={},
                   opt_state=opt.init(v["params"]))
step = jax.jit(make_train_step(model, opt, cond_model, cv))
bench("stage3 diffusion train step (freeze_ed, B=8 x 2.4s)", step, state, x, jax.random.PRNGKey(3))

# ---- stage 1: GAN codec train step ----
codec = DiffAudioRep(rep_dims=128, n_filters=32, lstm=2, enc_ratios=(8, 5, 4, 2),
                     quantization=True, bandwidth=1.5, rvq_kmeans_init=False)
disc = MultiScaleSTFTDiscriminator(filters=32)
xg = jnp.asarray(np.random.RandomState(1).randn(B, 32000, 1).astype(np.float32) * 0.1)  # 2s
vg = codec.init(jax.random.PRNGKey(4), xg)
dv = disc.init(jax.random.PRNGKey(5), xg)
gopt = optax.adam(5e-4); dopt = optax.adam(3e-4, b1=0.5, b2=0.9)
gstate = TrainState(step=jnp.asarray(0), params=vg["params"], quantizer=vg["quantizer"],
                    opt_state=gopt.init(vg["params"]), disc_params=dv["params"],
                    disc_opt_state=dopt.init(dv["params"]))
gen_step, disc_step = make_gan_train_step(codec, disc, gopt, dopt)
gen_step = jax.jit(gen_step); disc_step = jax.jit(disc_step)

out = gen_step(gstate, xg, jax.random.PRNGKey(6)); jax.block_until_ready(out[1])
s2, m2, xh = out
out2 = disc_step(s2, xg, xh); jax.block_until_ready(out2[1])
iters = 5
t0 = time.perf_counter()
for i in range(iters):
    s2, m2, xh = gen_step(gstate, xg, jax.random.fold_in(jax.random.PRNGKey(6), i))
    s3, ld = disc_step(s2, xg, xh)
jax.block_until_ready(ld)
dt = (time.perf_counter() - t0) / iters
print(f"stage1 GAN codec gen+disc step (B=8 x 2.0s): {dt*1000:.0f} ms/step = {B*2.0/dt:.1f} audio-sec/s/chip", flush=True)
