"""Trainer internals: freeze_ed optimizer masking, EMA in the step, and the
48 kHz stereo EnCodec path (segments + volume normalize + time_group_norm)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from ladiffcodec_tpu.models.diff_rep import DiffAudioRep
from ladiffcodec_tpu.training import TrainState, make_optimizer, make_train_step

pytestmark = pytest.mark.slow  # compile-heavy; excluded from `pytest -m 'not slow'`


def test_freeze_ed_only_updates_diff_model():
    m = DiffAudioRep(
        rep_dims=16, diff_dims=16, n_filters=4, lstm=0, enc_ratios=(8,),
        run_diff=True, model_type="unet", scaling_global=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 1)) * 0.1
    v = m.init(jax.random.PRNGKey(1), x)
    opt = make_optimizer(1e-2, freeze_ed=True)
    state = TrainState(step=jnp.asarray(0), params=v["params"], quantizer={},
                       opt_state=opt.init(v["params"]))
    step = jax.jit(make_train_step(m, opt))
    state2, losses = step(state, x, jax.random.PRNGKey(2))

    def maxdiff(a, b):
        return max(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda p, q: float(jnp.max(jnp.abs(p - q))), a, b)
        ))

    assert maxdiff(state.params["diff_model"], state2.params["diff_model"]) > 0
    assert maxdiff(state.params["encoder"], state2.params["encoder"]) == 0
    assert maxdiff(state.params["decoder"], state2.params["decoder"]) == 0


def test_freeze_ed_zero_update_under_nonzero_frozen_grads():
    """optax.masked passes raw grads through as updates for frozen leaves
    (params += grad!), which destroyed the frozen decoder the moment a loss
    (deq_mel_weight) backpropagated through it — the stage3_diff_r8 step-0
    NaN. make_optimizer must pin frozen updates to exactly zero."""
    params = {"diff_model": {"w": jnp.zeros(3)},
              "decoder": {"w": jnp.zeros(3)},
              "encoder": {"w": jnp.zeros(3)}}
    grads = {"diff_model": {"w": jnp.ones(3)},
             "decoder": {"w": 7.0 * jnp.ones(3)},
             "encoder": {"w": -3.0 * jnp.ones(3)}}
    opt = make_optimizer(1e-2, freeze_ed=True, grad_clip=1.0)
    st = opt.init(params)
    upd, _ = opt.update(grads, st, params)
    assert float(jnp.max(jnp.abs(upd["decoder"]["w"]))) == 0.0
    assert float(jnp.max(jnp.abs(upd["encoder"]["w"]))) == 0.0
    assert float(jnp.max(jnp.abs(upd["diff_model"]["w"]))) > 0.0


def test_ema_in_train_step():
    m = DiffAudioRep(enc_ratios=(8, 4), rep_dims=8, n_filters=4, lstm=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 1)) * 0.1
    v = m.init(jax.random.PRNGKey(1), x)
    opt = optax.adam(1e-2)
    state = TrainState(step=jnp.asarray(0), params=v["params"], quantizer={},
                       opt_state=opt.init(v["params"]), ema_params=v["params"])
    step = jax.jit(make_train_step(m, opt, ema_decay=0.9))
    state2, _ = step(state, x, jax.random.PRNGKey(2))
    # ema moved toward new params but not all the way
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    e1 = jax.tree_util.tree_leaves(state2.ema_params)[0]
    expected = p0 * 0.9 + p1 * 0.1
    np.testing.assert_allclose(np.asarray(e1), np.asarray(expected), rtol=1e-5, atol=1e-7)


def test_encodec_48khz_stereo_segments():
    from ladiffcodec_tpu.bitstream.encodec_model import EncodecModel

    m = EncodecModel(
        target_bandwidths=[3.0, 6.0], sample_rate=48000, channels=2, causal=False,
        model_norm="time_group_norm", audio_normalize=True, segment=0.01,
        name="encodec_48khz", ratios=(8, 5, 4, 2), dimension=16,
    )
    m.encoder = type(m.encoder)(
        channels=2, norm="time_group_norm", causal=False, ratios=(8, 5, 4, 2),
        dimension=16, n_filters=4, lstm=0,
    )
    m.decoder = type(m.decoder)(
        channels=2, norm="time_group_norm", causal=False, ratios=(8, 5, 4, 2),
        dimension=16, n_filters=4, lstm=0,
    )
    from ladiffcodec_tpu.quantization.rvq import ResidualVectorQuantizer

    m.quantizer = ResidualVectorQuantizer(dimension=16, n_q=4, bins=64, kmeans_init=False)
    m.set_target_bandwidth(3.0)
    v = m.init_variables(jax.random.PRNGKey(0), example_len=480)

    x = np.random.RandomState(0).randn(1, 1200, 2).astype(np.float32) * 0.1
    frames = m.encode(v, x)
    assert len(frames) == 3  # segment 480 samples, stride 475
    codes, scale = frames[0]
    assert scale is not None  # audio_normalize
    y = m.forward(v, x)
    assert y.shape == x.shape
    assert np.isfinite(y).all()


def test_scanned_step_matches_sequential():
    """make_scanned_step(n): one lax.scan dispatch == n sequential steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from ladiffcodec_tpu.models.diff_rep import DiffAudioRep
    from ladiffcodec_tpu.training import TrainState, make_train_step, make_scanned_step

    m = DiffAudioRep(enc_ratios=(8, 4), rep_dims=8, n_filters=4, lstm=0)
    batches = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 64, 1)) * 0.1
    v = m.init(jax.random.PRNGKey(1), batches[0])
    opt = optax.adam(1e-3)
    s0 = TrainState(step=jnp.asarray(0), params=v["params"], quantizer={},
                    opt_state=opt.init(v["params"]))
    step = make_train_step(m, opt)

    key = jax.random.PRNGKey(42)
    seq = s0
    for i in range(3):
        seq, last = jax.jit(step)(seq, batches[i], jax.random.split(key, 3)[i])

    scanned = jax.jit(make_scanned_step(step, 3))
    fused, metrics = scanned(s0, batches, key)

    assert int(fused.step) == 3
    # scan-body vs standalone-jit compile differences reassociate the Adam
    # rsqrt chain; equivalence is structural, not bitwise
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=5e-2, atol=1e-3),
        seq.params, fused.params)
    assert np.isfinite(float(metrics["neg_sdr"]))


@pytest.mark.parametrize("disc_freq", [1, 2])
def test_scanned_gan_step_matches_sequential(disc_freq):
    """make_scanned_gan_step(n): one dispatch == n (gen + cadenced disc)
    iterations (the fusion that makes real stage-1 GAN training affordable
    on a dispatch-bound host, VERDICT r2 item 2)."""
    from ladiffcodec_tpu.models.msstftd import MultiScaleSTFTDiscriminator
    from ladiffcodec_tpu.training import make_gan_train_step, make_scanned_gan_step

    m = DiffAudioRep(enc_ratios=(8, 5, 4, 2), rep_dims=8, n_filters=4, lstm=0,
                     quantization=True, bandwidth=1.5,
                     rvq_threshold_ema_dead_code=0.0,
                     rvq_kmeans_init=False)
    disc = MultiScaleSTFTDiscriminator(filters=2)
    batches = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 3200, 1)) * 0.1
    v = m.init(jax.random.PRNGKey(1), batches[0])
    dv = disc.init(jax.random.PRNGKey(2), batches[0])
    opt = optax.adam(1e-3)
    dopt = optax.adam(1e-3)
    s0 = TrainState(step=jnp.asarray(0), params=v["params"],
                    quantizer=v.get("quantizer", {}),
                    opt_state=opt.init(v["params"]),
                    disc_params=dv["params"],
                    disc_opt_state=dopt.init(dv["params"]))
    gen_step, disc_step = make_gan_train_step(m, disc, opt, dopt)

    key = jax.random.PRNGKey(42)
    keys = jax.random.split(key, 4)
    seq = s0
    jgen, jdisc = jax.jit(gen_step), jax.jit(disc_step)
    for i in range(4):
        step_before = int(seq.step)
        seq, metrics, x_hat = jgen(seq, batches[i], keys[i])
        if step_before % disc_freq == 0:  # cadence keys on the global step
            seq, _ = jdisc(seq, batches[i], x_hat)

    scanned = jax.jit(make_scanned_gan_step(gen_step, disc_step, 4, disc_freq))
    fused, metrics = scanned(s0, batches, key)

    assert int(fused.step) == 4
    for tree_a, tree_b in ((seq.params, fused.params),
                           (seq.disc_params, fused.disc_params)):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-2, atol=1e-3),
            tree_a, tree_b)
    assert np.isfinite(float(metrics["l_d"]))
    assert np.isfinite(float(metrics["g_loss"]))
