"""Training CLI — single entry for all three LaDiffCodec stages, selected by
flags exactly as the reference (`python -m ladiffcodec_tpu.train`; reference
srcs/train.py:229-419 and README.md:41-63):

  stage 1 (discrete codec, GAN):   --quantization --use_disc --bandwidth ...
  stage 2 (continuous AE):         (no flags: plain neg-SDR autoencoder)
  stage 3 (latent diffusion):      --run_diff --model_type unet
                                   --scaling_global --model_for_cond ...

Differences by design: the whole optimization step (fwd+bwd+Adam+RVQ EMA) is
ONE jitted program, data-parallel over a `shard_map` mesh when more than one
device is visible; checkpoints carry optimizer state (true resume); k-means
codebook init runs explicitly on the first batch.
"""

from __future__ import annotations

import argparse
import time
import typing as tp

import numpy as np
import jax
import jax.numpy as jnp

from .models.diff_rep import DiffAudioRep, DiffAudioTime
from .models.msstftd import MultiScaleSTFTDiscriminator
from .data.librispeech import DatasetLibri, BatchLoader
from .parallel.mesh import make_mesh, DP_AXIS
from .training import (
    TrainState,
    make_optimizer,
    make_train_step,
    make_gan_train_step,
    shard_map_step,
)
from .utils.checkpoint import save_checkpoint, load_checkpoint_path, load_model_variables
from .utils.logging import log_params, logging_step
import optax


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="ladiffcodec_tpu trainer")
    # Data related (reference train.py:232-236)
    parser.add_argument("--output_dir", type=str, default="saved_models")
    parser.add_argument("--data_folder_path", type=str, default="/data/librispeech")
    parser.add_argument("--seq_len_p_sec", type=float, default=1.0)
    parser.add_argument("--sample_rate", type=int, default=16000)
    # Training (239-248)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--batch_size", type=int, default=5)
    parser.add_argument("--exp_name", type=str, default="")
    parser.add_argument("--finetune_model", type=str, default="")
    parser.add_argument("--write_on_every", type=int, default=50)
    parser.add_argument("--min_save_gain", type=float, default=0.002,
                        help="only write model_best when the selection metric "
                             "improved by this RELATIVE margin since the last "
                             "written best (full-TrainState orbax writes cost "
                             "~45s here; early training improves every eval). "
                             "model_best is thus at most this much worse than "
                             "the true best. 0 restores write-every-improvement")
    parser.add_argument("--model_type", type=str, default="transformer")
    parser.add_argument("--freeze_ed", action="store_true")
    parser.add_argument("--train_time_diff", action="store_true")
    # Encoder and decoder (251-259)
    parser.add_argument("--rep_dims", type=int, default=128)
    parser.add_argument("--emb_dims", type=int, default=128)
    parser.add_argument("--quantization", action="store_true")
    parser.add_argument("--bandwidth", type=float, default=3.0)
    parser.add_argument("--n_filters", type=int, default=32)
    parser.add_argument("--lstm", type=int, default=2)
    parser.add_argument("--n_residual_layers", type=int, default=1)
    parser.add_argument("--enc_ratios", nargs="+", type=int)
    parser.add_argument("--final_activation", type=str, default=None)
    parser.add_argument("--rvq_expire_threshold", type=float, default=2.0,
                        help="EMA dead-code expiry threshold (vq.py default 2). "
                             "0 disables expiry — the reference's EFFECTIVE "
                             "training dynamics (its expiry is overwritten by "
                             "the EMA normalization, core_vq.py:218-227); with "
                             "small batch*frames per step an effective "
                             "threshold of 2 churns the whole codebook and "
                             "collapses training")
    # Diff model (262-274)
    parser.add_argument("--diff_dims", type=int, default=128)
    parser.add_argument("--qtz_condition", action="store_true")
    parser.add_argument("--self_condition", action="store_true")
    parser.add_argument("--seq_length", type=int, default=800)
    parser.add_argument("--run_diff", action="store_true")
    parser.add_argument("--run_vae", action="store_true")
    parser.add_argument("--scaling_frame", action="store_true")
    parser.add_argument("--scaling_feature", action="store_true")
    parser.add_argument("--scaling_global", action="store_true")
    parser.add_argument("--global_scale", type=float, default=18.0,
                        help="scaling_global divisor (reference hardcodes 18, "
                             "assuming ~18 max-abs encoder latents; set to "
                             "your encoder's max-abs so diffusion sees O(1) "
                             "signals)")
    parser.add_argument("--scaling_dim", action="store_true")
    parser.add_argument("--use_film", action="store_true")
    parser.add_argument("--unet_scale_cond", action="store_true")
    parser.add_argument("--unet_scale_x", action="store_true")
    # Cond model (278-283)
    parser.add_argument("--model_for_cond", type=str, default="")
    parser.add_argument("--cond_enc_ratios", nargs="+", type=int)
    parser.add_argument("--upsampling_ratios", nargs="+", type=int)
    parser.add_argument("--cond_quantization", action="store_true")
    parser.add_argument("--cond_bandwidth", type=float, default=3.0)
    parser.add_argument("--cond_global", type=float, default=3.0)
    # Disc (286-287)
    parser.add_argument("--use_disc", action="store_true")
    parser.add_argument("--disc_freq", type=int, default=1)
    # TPU-native extras
    parser.add_argument("--steps", type=int, default=50000)
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="fuse N optimizer steps into one jitted lax.scan "
                             "dispatch (amortizes host->device dispatch of the "
                             "TrainState, which dominates wall time on "
                             "remote-tunnel runtimes); single-device path "
                             "(GAN included); epoch-end remainder batches "
                             "flush through the unscanned step")
    parser.add_argument("--dp_devices", type=int, default=0, help="0 = all visible")
    parser.add_argument("--ema_decay", type=float, default=0.0,
                        help="EMA shadow of params (0 = off; reference builds "
                             "but never enables EMA, utils.py:182/train.py:361)")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="write a jax.profiler trace of training steps "
                             "2-6 of the first epoch to this directory")
    parser.add_argument("--grad_clip", type=float, default=0.0,
                        help="clip gradients to this global norm before Adam "
                             "(0 = off, the reference behavior)")
    parser.add_argument("--mel_weight", type=float, default=0.0,
                        help="add w * multi-scale log-mel loss to the codec/AE "
                             "objective (0 = reference-faithful neg-SDR only)")
    parser.add_argument("--melspec_compat", action="store_true",
                        help="reproduce the reference's single-scale melspec-loss bug")
    parser.add_argument("--cond_pred_weight", type=float, default=0.0,
                        help="aux loss tying process_cond(cond) to the scaled "
                             "target latent, so the reference's halfway chain "
                             "start (sample.py:125-131) is on-distribution "
                             "(0 = reference-faithful diffusion loss only)")
    parser.add_argument("--diff_objective", type=str, default="pred_noise",
                        choices=["pred_noise", "pred_x0", "pred_v"],
                        help="diffusion parameterization. pred_noise = "
                             "reference-faithful eps-L1. For a STRONGLY "
                             "conditioned de-quantizer, eps at low SNR is "
                             "~the input noise, so the gradient that wires "
                             "cond->x0 scales with sqrt(snr) and the cond "
                             "pathway trains ~never at high t (measured: "
                             "ancestral-from-noise lands 45 dB below the "
                             "chain-start prediction); pred_v equals eps at "
                             "high SNR and -x0 at low SNR, balancing both")
    parser.add_argument("--deq_weight", type=float, default=0.0,
                        help="aux loss at the DETERMINISTIC dequantization "
                             "operating point: one extra model call per step "
                             "at x_td = sqrt(ab_td) * re-encoded codec latent "
                             "(the onestep/ddim_deq chain start; the 'noise' "
                             "is the codec error, which the Gaussian diffusion "
                             "objective never shows the model), with "
                             "L1(pred_x0, clean latent) added to the target "
                             "(0 = reference-faithful diffusion loss only)")
    parser.add_argument("--deq_mel_weight", type=float, default=0.0,
                        help="with --deq_weight: also decode the dequant "
                             "pred_x0 through the frozen decoder and add "
                             "w * multi-scale log-mel vs the input — trains "
                             "the metric the de-quantizer is judged on "
                             "(costs a decoder fwd+bwd per step)")
    parser.add_argument("--deq_t_lo", type=int, default=50,
                        help="dequant aux: td ~ U[lo, hi); the codec-error-"
                             "matched t is where sqrt(1-ab_t)/sqrt(ab_t) "
                             "crosses the latent-domain codec-error RMS")
    parser.add_argument("--deq_t_hi", type=int, default=300)
    parser.add_argument("--data_std", type=float, default=1.0,
                        help="per-element std of the scaled latent "
                             "(x_rep/global_scale); the diffusion schedule is "
                             "SNR-shifted by 1/data_std so a max-abs-normalized "
                             "latent with small RMS still sees a unit-std SNR "
                             "trajectory (1.0 = reference schedule; 0 = "
                             "auto-measure from the restored encoder on the "
                             "first batch)")
    return parser


def build_model(inp_args, other_cond: bool) -> tp.Union[DiffAudioRep, DiffAudioTime]:
    common = dict(
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
        cond_channels=inp_args.rep_dims,  # match sample.py; the cond latent
        # has rep_dims channels (reference hardcodes both at 128)
        upsampling_ratios=tuple(inp_args.upsampling_ratios) if inp_args.upsampling_ratios else None,
        unet_scale_x=inp_args.unet_scale_x,
        unet_scale_cond=inp_args.unet_scale_cond,
        cond_pred_weight=getattr(inp_args, "cond_pred_weight", 0.0),
        deq_weight=getattr(inp_args, "deq_weight", 0.0),
        deq_mel_weight=getattr(inp_args, "deq_mel_weight", 0.0),
        deq_t_lo=getattr(inp_args, "deq_t_lo", 50),
        deq_t_hi=getattr(inp_args, "deq_t_hi", 300),
        diff_objective=getattr(inp_args, "diff_objective", "pred_noise"),
        # 0 = auto-measure sentinel: build with the neutral schedule, the
        # trainer clones the model with the measured value before stepping
        data_std=getattr(inp_args, "data_std", 1.0) or 1.0,
    )
    if inp_args.train_time_diff:
        if common.get("deq_weight") or common.get("deq_mel_weight"):
            # ADVICE r4: DiffAudioTime accepts the flags for CLI parity but
            # has no deq loss; without this the user pays a per-step codec
            # decode for nothing
            print("WARNING: --deq_weight/--deq_mel_weight have no effect "
                  "with --train_time_diff (DiffAudioTime has no "
                  "dequantization loss); skipping the per-step deq decode")
        return DiffAudioTime(**common)
    return DiffAudioRep(
        norm="weight_norm",
        causal=True,
        dilation_base=2,
        n_residual_layers=inp_args.n_residual_layers,
        n_filters=inp_args.n_filters,
        lstm=inp_args.lstm,
        quantization=inp_args.quantization,
        bandwidth=inp_args.bandwidth,
        rvq_threshold_ema_dead_code=inp_args.rvq_expire_threshold,
        sample_rate=inp_args.sample_rate,
        enc_ratios=tuple(inp_args.enc_ratios) if inp_args.enc_ratios else (8, 5, 4, 2),
        run_diff=inp_args.run_diff,
        run_vae=inp_args.run_vae,
        freeze_ed=inp_args.freeze_ed,
        final_activation=inp_args.final_activation,
        **common,
    )


def build_cond_model(inp_args, quantization: tp.Optional[bool] = None) -> DiffAudioRep:
    """The frozen conditioning codec (reference train.py:353-359)."""
    return DiffAudioRep(
        rep_dims=inp_args.rep_dims,
        emb_dims=inp_args.emb_dims,
        n_residual_layers=inp_args.n_residual_layers,
        n_filters=inp_args.n_filters,
        lstm=inp_args.lstm,
        quantization=inp_args.cond_quantization if quantization is None else quantization,
        bandwidth=inp_args.cond_bandwidth,
        enc_ratios=tuple(inp_args.cond_enc_ratios) if inp_args.cond_enc_ratios else (8, 5, 4, 2),
        final_activation=inp_args.final_activation,
    )


def run_eval_epoch(eval_step, state, loader, cond_vars, key):
    tot: tp.Dict[str, float] = {}
    n = 0
    for batch in loader:
        key, sub = jax.random.split(key)
        losses = eval_step(state, jnp.asarray(batch), sub)
        for k, v in losses.items():
            tot[k] = tot.get(k, 0.0) + float(v)
        n += 1
        if n >= 8:  # bounded eval pass
            break
    return {k: v / max(n, 1) for k, v in tot.items()}


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    # persistent compile cache: restarted/chained runs skip the multi-minute
    # tunnel compile of the scanned train step (same cache as bench.py)
    from .utils.compile_cache import setup_compile_cache

    setup_compile_cache()
    inp_args = get_parser().parse_args(argv)
    assert not (inp_args.self_condition and inp_args.qtz_condition)

    if not inp_args.debug and inp_args.exp_name:
        log_params(vars(inp_args), inp_args.exp_name)
        from .utils.checkpoint import save_run_config

        save_run_config(vars(inp_args), inp_args.output_dir, inp_args.exp_name)

    if inp_args.dp_devices:
        n_dev = inp_args.dp_devices
    else:
        # largest visible device count that divides the batch
        n_dev = max(
            d for d in range(1, len(jax.devices()) + 1) if inp_args.batch_size % d == 0
        )
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    axis_name = DP_AXIS if mesh else None
    assert inp_args.batch_size % (n_dev if mesh else 1) == 0, "batch must divide dp devices"

    train_ds = DatasetLibri("train", inp_args.seq_len_p_sec, inp_args.data_folder_path,
                            inp_args.sample_rate)
    valid_ds = DatasetLibri("valid", inp_args.seq_len_p_sec, inp_args.data_folder_path,
                            inp_args.sample_rate)
    train_loader = BatchLoader(train_ds, inp_args.batch_size)
    valid_loader = BatchLoader(valid_ds, inp_args.batch_size, shuffle=False)

    other_cond = bool(inp_args.model_for_cond)
    model = build_model(inp_args, other_cond)

    key = jax.random.PRNGKey(0)
    example = jnp.zeros((inp_args.batch_size, int(inp_args.seq_len_p_sec * inp_args.sample_rate), 1))

    cond_model = cond_vars = None
    example_cond = None
    if other_cond:
        cond_model = build_cond_model(inp_args)
        cond_vars = cond_model.init(jax.random.PRNGKey(1), example)
        cond_vars = load_model_variables(cond_vars, inp_args.model_for_cond + "/model_best")
        example_cond = cond_model.apply(cond_vars, example, method="get_cond")

    variables = model.init(key, example, cond=example_cond)
    params = variables["params"]
    quantizer = variables.get("quantizer", {})

    optimizer = make_optimizer(inp_args.lr,
                               freeze_ed=inp_args.run_diff and inp_args.freeze_ed,
                               grad_clip=inp_args.grad_clip)
    state = TrainState(
        step=jnp.asarray(0), params=params, quantizer=quantizer,
        opt_state=optimizer.init(params),
        ema_params=params if inp_args.ema_decay > 0 else None,
    )

    disc = None
    disc_optimizer = None
    if inp_args.use_disc:
        disc = MultiScaleSTFTDiscriminator(filters=32)
        disc_vars = disc.init(jax.random.PRNGKey(2), example)
        disc_optimizer = optax.adam(3e-4, b1=0.5, b2=0.9)
        state = state.replace(
            disc_params=disc_vars["params"],
            disc_opt_state=disc_optimizer.init(disc_vars["params"]),
        )

    if inp_args.finetune_model:
        import os

        if not os.path.isdir(inp_args.finetune_model):
            raise FileNotFoundError(
                f"--finetune_model {inp_args.finetune_model!r} is not a "
                f"checkpoint directory")
        try:
            state = load_checkpoint_path(state, inp_args.finetune_model)
        except (ValueError, KeyError, TypeError):
            # strict restore rejects a different TrainState structure ->
            # cross-stage restore (reference README.md:41-63: stage-3 loads
            # the stage-2 continuous AE): merge matching param subtrees, keep
            # fresh opt state (freeze_ed masks the loaded weights anyway).
            # Other errors (corrupt checkpoint, wrong path type) propagate.
            from .utils.checkpoint import merge_matching, _rebuild_quantizer

            raw = load_checkpoint_path(None, inp_args.finetune_model)
            merged, n = merge_matching(state.params, raw.get("params", {}))
            n_total = len(jax.tree_util.tree_leaves(state.params))
            if n == 0:
                raise ValueError(
                    f"no overlapping params in {inp_args.finetune_model}")
            # Only warn when some top-level module was matched PARTIALLY.
            # All-or-nothing per module (e.g. stage-2 AE -> stage-3: full
            # encoder+decoder load, diff_model stays fresh) is the intended
            # cross-stage path, not a wrong-checkpoint symptom (ADVICE r3).
            src = raw.get("params", {})
            ragged = []
            for top, sub in state.params.items():
                want = len(jax.tree_util.tree_leaves(sub))
                _, got = merge_matching(sub, src.get(top, {}))
                if 0 < got < want:
                    ragged.append(f"{top} {got}/{want}")
            if ragged:
                print(f"WARNING: partial restore matched only {n}/{n_total} "
                      f"arrays, with incomplete modules ({', '.join(ragged)}) "
                      f"— check that {inp_args.finetune_model} is the "
                      f"intended stage checkpoint")
            state = state.replace(params=merged)
            if raw.get("quantizer") and state.quantizer:
                state = state.replace(
                    quantizer=_rebuild_quantizer(raw["quantizer"]))
            print(f"partial finetune restore: {n}/{n_total} matching arrays loaded")

    # --data_std 0 = auto: measure the scaled latent's per-element std with
    # the (restored, frozen) encoder on one training batch and SNR-shift the
    # schedule accordingly (see gaussian.make_schedule).  Runs after the
    # finetune restore so the measurement uses the real stage-2 encoder, and
    # re-persists config.json so sample/eval inherit the measured value.
    if (inp_args.run_diff and not inp_args.train_time_diff
            and getattr(inp_args, "data_std", 1.0) == 0.0):
        first = jnp.asarray(next(iter(train_loader)))
        rep = model.apply(
            {"params": state.params, "quantizer": state.quantizer},
            first, method="encode")
        gs = inp_args.global_scale if inp_args.scaling_global else 1.0
        inp_args.data_std = max(round(float(jnp.std(rep)) / gs, 6), 1e-4)
        model = model.clone(data_std=inp_args.data_std)
        print(f"auto-measured data_std = {inp_args.data_std} "
              f"(latent std {float(jnp.std(rep)):.4f} / global_scale {gs})")
        if inp_args.exp_name:
            from .utils.checkpoint import save_run_config

            save_run_config(vars(inp_args), inp_args.output_dir,
                            inp_args.exp_name)

    # k-means codebook init on the first batch (reference: lazy init inside
    # the first forward, core_vq.py:139-150)
    if inp_args.quantization and int(np.asarray(state.step)) == 0:
        first = jnp.asarray(next(iter(train_loader)))
        _, upd = model.apply(
            {"params": state.params, "quantizer": state.quantizer},
            first, jax.random.PRNGKey(3), method="kmeans_init", mutable=["quantizer"],
        )
        state = state.replace(quantizer=upd["quantizer"])

    # ---- build jitted steps ----
    scan_step = None  # N-steps-per-dispatch program (GAN or single-loss)
    if inp_args.use_disc:
        gen_step_fn, disc_step_fn = make_gan_train_step(
            model, disc, optimizer, disc_optimizer, axis_name=axis_name,
            melspec_compat=inp_args.melspec_compat,
        )
        if mesh:
            from jax.sharding import PartitionSpec as P
            gen_step = jax.jit(jax.shard_map(
                gen_step_fn, mesh=mesh, in_specs=(P(), P(DP_AXIS), P()),
                out_specs=(P(), P(), P(DP_AXIS)), check_vma=False))
            disc_step = jax.jit(jax.shard_map(
                disc_step_fn, mesh=mesh, in_specs=(P(), P(DP_AXIS), P(DP_AXIS)),
                out_specs=(P(), P()), check_vma=False))
        else:
            gen_step = jax.jit(gen_step_fn)
            disc_step = jax.jit(disc_step_fn)
            if inp_args.steps_per_dispatch > 1:
                from .training import make_scanned_gan_step

                scan_step = jax.jit(make_scanned_gan_step(
                    gen_step_fn, disc_step_fn, inp_args.steps_per_dispatch,
                    inp_args.disc_freq))
    else:
        step_fn = make_train_step(
            model, optimizer, cond_model, cond_vars, axis_name=axis_name,
            ema_decay=inp_args.ema_decay if inp_args.ema_decay > 0 else None,
            mel_weight=inp_args.mel_weight if not inp_args.run_diff else 0.0,
        )
        if mesh:
            train_step = shard_map_step(step_fn, mesh)
        else:
            train_step = jax.jit(step_fn)
        if inp_args.steps_per_dispatch > 1 and not mesh:
            from .training import make_scanned_step

            scan_step = jax.jit(
                make_scanned_step(step_fn, inp_args.steps_per_dispatch))

    def eval_losses(state, batch, key):
        cond = None
        deq_wav = None
        if cond_model is not None:
            cond = cond_model.apply(cond_vars, batch, method="get_cond")
            if getattr(model, "deq_weight", 0.0) and getattr(
                    model, "supports_deq", False):
                deq_wav = cond_model.apply(cond_vars, cond, method="decode")
        variables = (
            {"params": state.params, "quantizer": state.quantizer}
            if state.quantizer
            else {"params": state.params}
        )
        (losses, _), _ = model.apply(variables, batch, key=key, cond=cond, training=False,
                                     deq_wav=deq_wav, mutable=["quantizer"])
        return losses

    eval_step = jax.jit(eval_losses)

    best_loss = float("inf")
    last_saved_best = float("inf")
    # honor the flag (round-2 hardcoded 5: the every-5-epoch val pass is
    # itself ~an epoch of compute on this box, a 20% tax at the default)
    write_on_every = 1 if inp_args.debug else max(1, inp_args.write_on_every)
    rng = jax.random.PRNGKey(42)

    if inp_args.finetune_model and not inp_args.debug:
        # resuming: seed best_loss from the restored weights so the first
        # (typically worse) eval does not overwrite the previous model_best
        # (same FIXED key as the in-loop evals -> paired comparison)
        init_val = run_eval_epoch(
            lambda s, b, k: eval_step(s, b, k), state, valid_loader,
            cond_vars, jax.random.PRNGKey(1234)
        )
        best_loss = list(init_val.values())[-1]
        last_saved_best = best_loss
        print(f"finetune baseline val (selection metric): {best_loss:.4f}")

    # preemption safety (the failure handling the reference lacks, SURVEY
    # §5.3): SIGTERM triggers a full-TrainState checkpoint, so --finetune_model
    # resumes with optimizer state intact.
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not on the main thread (e.g. under a test runner)

    for step_i in range(inp_args.steps):
        if preempted["flag"]:
            if inp_args.exp_name:
                save_checkpoint(state, inp_args.output_dir, inp_args.exp_name,
                                note="preempt")
                print("SIGTERM: saved model_preempt, exiting")
            break
        if step_i == 0:
            print("Starts training ...")
        train_loader.set_epoch(step_i)
        t0 = time.time()
        tot: tp.Dict[str, float] = {}
        n = 0
        tracing = False
        spd = inp_args.steps_per_dispatch if not mesh else 1

        def one_step(state, batch, sub, n):
            if inp_args.use_disc:
                state, metrics, x_hat = gen_step(state, batch, sub)
                if n % inp_args.disc_freq == 0:
                    state, l_d = disc_step(state, batch, x_hat)
                    metrics = dict(metrics, l_d=l_d)
                return state, metrics
            return train_step(state, batch, sub)

        acc: tp.List[jnp.ndarray] = []
        for batch in train_loader:
            if inp_args.profile_dir and step_i == 0 and n == 1 and not tracing:
                jax.profiler.start_trace(inp_args.profile_dir)
                tracing = True
            if tracing and n == 4:
                jax.profiler.stop_trace()
                tracing = False
            rng, sub = jax.random.split(rng)
            batch = jnp.asarray(batch)
            if spd > 1:
                acc.append(batch)
                if len(acc) < spd:
                    continue
                state, metrics = scan_step(state, jnp.stack(acc), sub)
                acc = []
            else:
                state, metrics = one_step(state, batch, sub, n)
            for k, v in metrics.items():
                tot[k] = tot.get(k, 0.0) + float(v)
            n += 1
            if inp_args.debug:
                break
        # flush the epoch-end remainder through the unscanned step so no
        # batch is silently dropped (and an epoch shorter than
        # steps_per_dispatch still trains)
        for batch in acc:
            rng, sub = jax.random.split(rng)
            state, metrics = one_step(state, batch, sub, n)
            for k, v in metrics.items():
                tot[k] = tot.get(k, 0.0) + float(v)
            n += 1
        if tracing:
            jax.profiler.stop_trace()
        tr_losses = {k: v / max(n, 1) for k, v in tot.items()}

        if step_i % write_on_every == 0:
            # FIXED eval key: the diffusion val losses draw random timesteps,
            # so a per-epoch rng makes the selection metric fluctuate by
            # several dB and model_best a lottery; a constant key turns it
            # into a paired comparison across epochs.
            val_losses = run_eval_epoch(
                lambda s, b, k: eval_step(s, b, k), state, valid_loader,
                cond_vars, jax.random.PRNGKey(1234)
            )
            duration = time.time() - t0
            vall = list(val_losses.values())[-1]
            if inp_args.debug:
                print([float(v) for v in val_losses.values()])
            else:
                if vall < best_loss:
                    best_loss = vall
                    # Throttle the 100s-of-MB orbax write: early training
                    # improves at EVERY eval, and on this box a full
                    # TrainState save costs ~45 s — unthrottled best-saves
                    # were ~60% of stage-3 wall time.  Only write when the
                    # metric beat the last WRITTEN best by min_save_gain
                    # (relative), or on the final epoch so the run always
                    # ends with its best on disk.
                    rel_gain = (last_saved_best - vall) / max(abs(last_saved_best), 1e-12)
                    if (last_saved_best == float("inf")
                            or rel_gain >= inp_args.min_save_gain
                            or step_i >= inp_args.steps - write_on_every):
                        save_checkpoint(state, inp_args.output_dir, inp_args.exp_name, note="best")
                        last_saved_best = vall
                if step_i % 100 == 0 and step_i > 0:
                    # single rolling resume point: a multi-thousand-epoch run
                    # would otherwise accumulate dozens of full-TrainState dirs
                    save_checkpoint(state, inp_args.output_dir, inp_args.exp_name, note="latest")
                logging_step(step_i, tr_losses, val_losses, duration, inp_args.exp_name, best_loss)
        if inp_args.debug and step_i >= 1:
            break


if __name__ == "__main__":
    main()
