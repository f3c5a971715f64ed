"""EnCodec codec trainer with the gradient-norm Balancer
(`python -m ladiffcodec_tpu.bitstream.train`).

Counterpart of the reference's vendored trainers (srcs/encodec/train.py,
dist_train.py, manual_dist_train.py): encoder→RVQ→decoder with hinge GAN,
waveform L1 + multi-scale mel losses combined through the Balancer
(dist_train.py:122-125), commitment loss backpropagated separately
(the reference's `l_w.backward(retain_graph=True)`).

TPU-native: the whole generator step is ONE jitted program built around
`jax.vjp` — the balancer's per-loss gradients w.r.t. the decoded waveform
become a single cotangent pulled back through the network; data parallelism
is the same `shard_map`/psum pattern as the main trainer (no DDP, no manual
`sync_grad`)."""

from __future__ import annotations

import argparse
import time
import typing as tp

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from .encodec_model import EncodecModel
from ..models.msstftd import MultiScaleSTFTDiscriminator
from ..losses.balancer import Balancer, BalancerState
from ..losses.losses_fn import melspec_loss_fn
from ..losses.gan import gen_loss, disc_loss
from ..quantization.core import rvq_forward


@struct.dataclass
class EncodecTrainState:
    step: jnp.ndarray
    params: tp.Any  # {"encoder":..., "decoder":...}
    rvq: tp.Any
    opt_state: tp.Any
    disc_params: tp.Any
    disc_opt_state: tp.Any
    balancer_state: BalancerState


def make_encodec_gan_step(
    model: EncodecModel,
    disc: MultiScaleSTFTDiscriminator,
    optimizer: optax.GradientTransformation,
    disc_optimizer: optax.GradientTransformation,
    balancer: Balancer,
    n_q: int,
    commit_weight: float = 1.0,
    axis_name: tp.Optional[str] = None,
):
    enc_apply = lambda p, x: model.encoder.apply({"params": p}, x)
    dec_apply = lambda p, z: model.decoder.apply({"params": p}, z)

    def forward(params, rvq, x, key):
        emb = enc_apply(params["encoder"], x)
        out = rvq_forward(rvq, emb, n_q, training=True, key=key, axis_name=axis_name)
        s_hat = dec_apply(params["decoder"], out.quantized)
        return (s_hat, jnp.mean(out.commit_loss)), out.state

    def gen_step(state: EncodecTrainState, x: jnp.ndarray, key: jax.Array):
        (s_hat, commit), pullback, new_rvq = jax.vjp(
            lambda p: forward(p, state.rvq, x, key), state.params, has_aux=True
        )
        d_real, f_real = disc.apply({"params": state.disc_params}, x)

        def l_t(s):
            return jnp.mean(jnp.abs(x - s))

        def l_f(s):
            return melspec_loss_fn(x, s, range(5, 12))

        def l_g_feat(s):
            d_gen, f_gen = disc.apply({"params": state.disc_params}, s)
            return gen_loss(d_real, f_real, d_gen, f_gen)

        loss_fns = {
            "l_t": l_t,
            "l_f": l_f,
            "l_g": lambda s: l_g_feat(s)[0],
            "l_feat": lambda s: l_g_feat(s)[1],
        }
        cot, new_bal, bal_metrics = balancer.cotangent(
            state.balancer_state, loss_fns, s_hat, axis_name=axis_name
        )
        # single pullback: balancer cotangent on s_hat + commit-loss cotangent
        (grads,) = pullback((cot, jnp.asarray(commit_weight, jnp.float32)))
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "l_t": l_t(s_hat),
            "l_f": l_f(s_hat),
            "commit": commit,
            **bal_metrics,
        }
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                rvq=new_rvq,
                opt_state=opt_state,
                balancer_state=new_bal,
            ),
            metrics,
            s_hat,
        )

    def disc_step(state: EncodecTrainState, x: jnp.ndarray, s_hat: jnp.ndarray):
        def d_loss(dp):
            d_real, _ = disc.apply({"params": dp}, x)
            d_gen, _ = disc.apply({"params": dp}, jax.lax.stop_gradient(s_hat))
            return disc_loss(d_real, d_gen)

        l_d, grads = jax.value_and_grad(d_loss)(state.disc_params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            l_d = jax.lax.pmean(l_d, axis_name)
        updates, d_opt = disc_optimizer.update(grads, state.disc_opt_state, state.disc_params)
        return (
            state.replace(
                disc_params=optax.apply_updates(state.disc_params, updates),
                disc_opt_state=d_opt,
            ),
            l_d,
        )

    return gen_step, disc_step


def main(argv=None):
    parser = argparse.ArgumentParser("ladiffcodec_tpu.bitstream.train")
    parser.add_argument("--data_folder_path", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="saved_models")
    parser.add_argument("--exp_name", type=str, default="encodec")
    parser.add_argument("--seq_len_p_sec", type=float, default=1.0)
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--bandwidth", type=float, default=1.5)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--steps", type=int, default=50000)
    parser.add_argument("--disc_freq", type=int, default=1)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)

    from ..data.librispeech import DatasetLibri, BatchLoader
    from ..utils.checkpoint import save_checkpoint

    model = EncodecModel(
        target_bandwidths=[args.bandwidth],
        sample_rate=args.sample_rate,
        channels=1,
        causal=True,
        name="encodec_24khz",
    )
    model.set_target_bandwidth(args.bandwidth)
    n_q = model.quantizer.get_num_quantizers_for_bandwidth(model.frame_rate, args.bandwidth)

    L = int(args.seq_len_p_sec * args.sample_rate)
    variables = model.init_variables(jax.random.PRNGKey(0), example_len=L)
    disc = MultiScaleSTFTDiscriminator(filters=32)
    x0 = jnp.zeros((args.batch_size, L, 1))
    disc_vars = disc.init(jax.random.PRNGKey(1), x0)

    optimizer = optax.adam(args.lr, b1=0.5, b2=0.9)
    disc_optimizer = optax.adam(3e-4, b1=0.5, b2=0.9)
    balancer = Balancer({"l_t": 0.1, "l_f": 1.0, "l_g": 3.0, "l_feat": 3.0},
                        rescale_grads=True)

    params = {"encoder": variables["encoder"], "decoder": variables["decoder"]}
    state = EncodecTrainState(
        step=jnp.asarray(0),
        params=params,
        rvq=variables["rvq"],
        opt_state=optimizer.init(params),
        disc_params=disc_vars["params"],
        disc_opt_state=disc_optimizer.init(disc_vars["params"]),
        balancer_state=balancer.init_state(),
    )
    gen_step, disc_step = make_encodec_gan_step(
        model, disc, optimizer, disc_optimizer, balancer, n_q
    )
    gen_step = jax.jit(gen_step)
    disc_step = jax.jit(disc_step)

    ds = DatasetLibri("train", args.seq_len_p_sec, args.data_folder_path, args.sample_rate)
    loader = BatchLoader(ds, args.batch_size)
    key = jax.random.PRNGKey(42)

    for step_i in range(args.steps):
        loader.set_epoch(step_i)
        t0 = time.time()
        for i, batch in enumerate(loader):
            key, sub = jax.random.split(key)
            state, metrics, s_hat = gen_step(state, jnp.asarray(batch), sub)
            if i % args.disc_freq == 0:
                state, l_d = disc_step(state, jnp.asarray(batch), s_hat)
            if args.debug:
                print({k: float(v) for k, v in metrics.items()}, "l_d", float(l_d))
                break
        if args.debug and step_i >= 1:
            break
        if step_i % 100 == 0 and not args.debug:
            save_checkpoint(state, args.output_dir, args.exp_name, note=str(step_i))
            print(f"step {step_i} {time.time() - t0:.1f}s",
                  {k: round(float(v), 4) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
