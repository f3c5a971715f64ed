"""Jitted training steps: single-loss, GAN (generator+discriminator), and
their data-parallel `shard_map` variants.

Replaces the reference's `run_model` inner loop (srcs/train.py:110-177) and
the dead DDP block (train.py:298-320): gradients are `pmean`-reduced over the
mesh axis inside one compiled step — no NCCL, no DDP wrapper, no param-count
deadlock guard (collective order is fixed by the program).
"""

from __future__ import annotations

import typing as tp


import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from .models.diff_rep import DiffAudioRep
from .models.msstftd import MultiScaleSTFTDiscriminator
from .losses.gan import gen_loss, disc_loss
from .losses.losses_fn import melspec_loss_fn
from .parallel.mesh import DP_AXIS, dp_axis_names


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: tp.Any
    quantizer: tp.Any  # RVQ collection ({} when not quantized)
    opt_state: tp.Any
    disc_params: tp.Any = None
    disc_opt_state: tp.Any = None
    ema_params: tp.Any = None


def make_optimizer(lr: float, freeze_ed: bool = False,
                   grad_clip: float = 0.0) -> optax.GradientTransformation:
    """Adam(lr); with freeze_ed only diffusion-model params update
    (reference train.py:363-372 optimizes model.diffusion only).
    `grad_clip > 0` prepends global-norm clipping — the stabilizer the
    reference lacks; an early lr spike can collapse the ε-predictor into
    the degenerate zero output (loss pinned at E|ε| = √(2/π))."""
    tx = optax.adam(lr)
    if grad_clip and grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if freeze_ed:
        # NOT optax.masked: masked passes the RAW gradient through as the
        # update for frozen leaves, so apply_updates does params += grad on
        # them. Harmless while frozen-param grads were exactly zero (r7
        # skipped the decoder readout in training), but any loss that
        # backprops through the frozen decoder (deq_mel_weight) destroyed
        # the decoder in one step -> instant NaN (stage3_diff_r8 step-0
        # failure). multi_transform + set_to_zero pins frozen updates to 0.
        def label(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "train" if any(
                    getattr(k, "key", None) == "diff_model" for k in path
                ) else "freeze",
                params,
            )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, label
        )
    return tx


def _first(d: tp.Mapping[str, jnp.ndarray]) -> jnp.ndarray:
    return next(iter(d.values()))


def make_train_step(
    model: DiffAudioRep,
    optimizer: optax.GradientTransformation,
    cond_model: tp.Optional[DiffAudioRep] = None,
    cond_variables: tp.Optional[tp.Any] = None,
    axis_name: tp.Optional[str] = None,
    ema_decay: tp.Optional[float] = None,
    mel_weight: float = 0.0,
):
    """Single-objective step (stages 2-3: continuous AE / diffusion).

    `mel_weight > 0` adds a multi-scale log-mel term on the reconstruction to
    the optimizer target (opt-in: the reference's non-GAN stages train on
    neg-SDR alone, srcs/model.py:209-221, which converges slowly from
    scratch; the GAN stage uses the same melspec loss, train.py:133-139).

    Returns step(state, batch, key) -> (state, metrics dict).
    """

    def loss_fn(params, quantizer, x, key, cond, deq_wav):
        variables = {"params": params, "quantizer": quantizer} if quantizer else {"params": params}
        out, updates = model.apply(
            variables,
            x,
            key=key,
            cond=cond,
            training=True,
            axis_name=axis_name,
            deq_wav=deq_wav,
            mutable=["quantizer"],
        )
        losses, aux = out
        target = _first(losses)
        if mel_weight:
            mel = melspec_loss_fn(x, aux["x_hat"], range(5, 12))
            target = target + mel_weight * mel
            losses = dict(losses, mel=mel)
        return target, (losses, updates.get("quantizer", quantizer))

    def step(state: TrainState, batch: jnp.ndarray, key: jax.Array):
        cond = None
        deq_wav = None
        if cond_model is not None:
            cond = cond_model.apply(cond_variables, batch, method="get_cond")
            if getattr(model, "deq_weight", 0.0) and getattr(
                    model, "supports_deq", False):
                # the dequantization operating point's chain start: the
                # codec's decoded waveform (re-encoded inside the model)
                deq_wav = jax.lax.stop_gradient(
                    cond_model.apply(cond_variables, cond, method="decode")
                )
        (_, (losses, new_q)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.quantizer, batch, key, cond, deq_wav
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            losses = jax.lax.pmean(losses, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_decay is not None and ema_params is not None:
            ema_params = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay), ema_params, params
            )
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                quantizer=new_q,
                opt_state=opt_state,
                ema_params=ema_params,
            ),
            losses,
        )

    return step


def make_scanned_step(step_fn, n: int):
    """Fuse `n` sequential train steps into ONE dispatch via `lax.scan`.

    Host->device dispatch of a large TrainState pytree costs ~100-200 ms per
    call through a remote-tunnel runtime while the device step itself is
    single-digit ms (BASELINE.md GAN profile), so amortizing n steps per
    dispatch raises wall-clock training throughput by up to n-fold.  Takes
    stacked batches (n, B, ...) and one key; metrics are averaged over the n
    inner steps.
    """

    def scanned(state, batches, key):
        keys = jax.random.split(key, batches.shape[0])

        def body(carry, xs):
            batch, k = xs
            new_state, metrics = step_fn(carry, batch, k)
            return new_state, metrics

        state, metrics = jax.lax.scan(body, state, (batches, keys))
        return state, jax.tree_util.tree_map(jnp.mean, metrics)

    return scanned


def make_scanned_gan_step(gen_step, disc_step, n: int, disc_freq: int = 1):
    """Fuse `n` GAN iterations (generator step + discriminator step every
    `disc_freq` iterations, reference train.py:144-149) into ONE `lax.scan`
    dispatch.

    The round-2 profile (BASELINE.md) showed the GAN step is 2.7 ms gen +
    2.7 ms disc on device but ~200 ms wall through a remote-tunnel runtime —
    ~97% host dispatch of the 4-collection TrainState.  Scanning n iterations
    per dispatch amortizes that host cost exactly like the non-GAN
    `make_scanned_step`.  The discriminator cadence keys on the global
    `state.step` counter (incremented by gen_step), which reproduces the
    reference's every-`disc_freq`-batches schedule for epochs whose length is
    a multiple of `disc_freq`.
    """

    def scanned(state: TrainState, batches, key):
        keys = jax.random.split(key, batches.shape[0])

        def body(carry, xs):
            batch, k = xs
            carry, metrics, x_hat = gen_step(carry, batch, k)
            if disc_freq == 1:
                carry, l_d = disc_step(carry, batch, x_hat)
            else:
                carry, l_d = jax.lax.cond(
                    (carry.step - 1) % disc_freq == 0,
                    lambda s: disc_step(s, batch, x_hat),
                    lambda s: (s, jnp.asarray(0.0, jnp.float32)),
                    carry,
                )
            metrics = dict(metrics, l_d=l_d)
            return carry, metrics

        state, metrics = jax.lax.scan(body, state, (batches, keys))
        return state, jax.tree_util.tree_map(jnp.mean, metrics)

    return scanned


def make_gan_train_step(
    model: DiffAudioRep,
    disc: MultiScaleSTFTDiscriminator,
    optimizer: optax.GradientTransformation,
    disc_optimizer: optax.GradientTransformation,
    axis_name: tp.Optional[str] = None,
    melspec_compat: bool = False,
):
    """Stage-1 GAN codec step (reference train.py:125-149):
    g_loss = 0.1·l_t + l_f + 3·l_g + 3·l_feat + 0.1·l_orig; the
    discriminator step runs every `disc_freq` host iterations via
    `disc_step`."""

    def g_loss_fn(params, quantizer, disc_params, x, key):
        variables = {"params": params, "quantizer": quantizer} if quantizer else {"params": params}
        out, updates = model.apply(
            variables, x, key=key, training=True, axis_name=axis_name, mutable=["quantizer"]
        )
        losses, aux = out
        x_hat = aux["x_hat"]
        l_orig = _first(losses)
        d_real, f_real = disc.apply({"params": disc_params}, x)
        d_gen, f_gen = disc.apply({"params": disc_params}, x_hat)
        l_g, l_feat = gen_loss(d_real, f_real, d_gen, f_gen)
        l_t = jnp.mean(jnp.abs(x - x_hat))
        l_f = melspec_loss_fn(x, x_hat, range(5, 12), compat=melspec_compat)
        g_total = 0.1 * l_t + l_f + 3.0 * l_g + 3.0 * l_feat + 0.1 * l_orig
        metrics = dict(losses)
        metrics.update(l_g=l_g, l_feat=l_feat, l_t=l_t, l_f=l_f, g_loss=g_total)
        return g_total, (metrics, updates.get("quantizer", quantizer), x_hat)

    def d_loss_fn(disc_params, x, x_hat):
        d_real, _ = disc.apply({"params": disc_params}, x)
        d_gen, _ = disc.apply({"params": disc_params}, jax.lax.stop_gradient(x_hat))
        return disc_loss(d_real, d_gen)

    def gen_step(state: TrainState, batch: jnp.ndarray, key: jax.Array):
        (_, (metrics, new_q, x_hat)), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params, state.quantizer, state.disc_params, batch, key
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params, quantizer=new_q, opt_state=opt_state),
            metrics,
            x_hat,
        )

    def disc_step(state: TrainState, batch: jnp.ndarray, x_hat: jnp.ndarray):
        l_d, grads = jax.value_and_grad(d_loss_fn)(state.disc_params, batch, x_hat)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            l_d = jax.lax.pmean(l_d, axis_name)
        updates, d_opt = disc_optimizer.update(grads, state.disc_opt_state, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, updates)
        return state.replace(disc_params=disc_params, disc_opt_state=d_opt), l_d

    return gen_step, disc_step


def shard_map_step(step_fn, mesh: Mesh, has_aux_batch: bool = False):
    """Lift a per-shard step into a full-batch jitted step over the mesh:
    state replicated, batch split over every data axis, outputs replicated
    (grads/losses are pmean'ed inside step_fn via its axis_name).

    On a 1-D ('dp',) mesh the batch splits over dp; on a 2-level
    ('dcn', 'dp') mesh (multi-slice scale-out) it splits over both, so
    the step_fn must be built with axis_name=dp_axis_names(mesh) and its
    collectives reduce hierarchically — XLA routes the inner axis over ICI
    and the outer over DCN."""
    batch_axes = dp_axis_names(mesh)
    in_specs = (P(), P(batch_axes), P())
    out_specs = (P(), P()) if not has_aux_batch else (P(), P(), P(batch_axes))
    wrapped = jax.shard_map(
        step_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )
    return jax.jit(wrapped)
