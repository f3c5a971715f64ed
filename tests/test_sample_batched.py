"""Batched sample-CLI decode: --decode_batch groups same-length files into
one device call and must produce per-file-normalized outputs identical in
count to sequential decode."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ladiffcodec_tpu.data.audio_io import write_wav, read_wav
pytestmark = pytest.mark.slow  # compile-heavy; excluded from `pytest -m 'not slow'`


def test_decode_batch_groups_files(tmp_path):
    from ladiffcodec_tpu.sample import main
    from ladiffcodec_tpu.train import build_cond_model
    from ladiffcodec_tpu.utils.checkpoint import save_checkpoint

    rng = np.random.RandomState(0)
    ind = tmp_path / "in"
    ind.mkdir()
    for i in range(3):  # same length -> one bucket, batch of 3
        t = np.arange(16000) / 16000
        write_wav(ind / f"f{i}.wav",
                  (0.3 * np.sin(2 * np.pi * (120 + 60 * i) * t)).astype(np.float32), 16000)

    class A:
        rep_dims, emb_dims, n_residual_layers, n_filters, lstm = 16, 16, 1, 4, 0
        cond_quantization, cond_bandwidth, final_activation = True, 1.5, None
        cond_enc_ratios = [8, 5, 4, 2]

    cond = build_cond_model(A, quantization=True)
    v = cond.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 1)))
    save_checkpoint(v, str(tmp_path), "condmodel", note="best")

    out = str(tmp_path / "outs") + "/"
    main([
        "--input_dir", str(ind) + "/",
        "--output_dir", out,
        "--model_for_cond", str(tmp_path / "condmodel" / "model_best"),
        "--run_diff", "--model_type", "unet", "--enc_ratios", "8",
        "--rep_dims", "16", "--diff_dims", "16", "--n_filters", "4", "--lstm", "0",
        "--scaling_global", "--unet_scale_cond",
        "--cond_enc_ratios", "8", "5", "4", "2", "--cond_bandwidth", "1.5",
        "--upsampling_ratios", "5", "4", "2",
        "--midway_t", "2", "--decode_batch", "3",
    ])
    outs = sorted(os.listdir(out))
    assert len(outs) == 3
    for f in outs:
        audio, sr = read_wav(os.path.join(out, f))
        assert np.isfinite(audio).all()
        # per-file peak normalization: every file peaks at ~1
        assert 0.9 < np.abs(audio).max() <= 1.0 + 1e-5


def test_segmented_long_audio_decode(tmp_path):
    """--segment_s decodes an arbitrary-length file in fixed segments with
    overlap-add: one compiled shape regardless of file length."""
    from ladiffcodec_tpu.sample import main
    from ladiffcodec_tpu.train import build_cond_model
    from ladiffcodec_tpu.utils.checkpoint import save_checkpoint

    ind = tmp_path / "in"
    ind.mkdir()
    t = np.arange(30080) / 16000  # odd length: 47 x 640
    write_wav(ind / "long.wav", (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32),
              16000)

    class A:
        rep_dims, emb_dims, n_residual_layers, n_filters, lstm = 16, 16, 1, 4, 0
        cond_quantization, cond_bandwidth, final_activation = True, 1.5, None
        cond_enc_ratios = [8, 5, 4, 2]

    cond = build_cond_model(A, quantization=True)
    v = cond.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 1)))
    save_checkpoint(v, str(tmp_path), "condmodel", note="best")

    out = str(tmp_path / "outs") + "/"
    main([
        "--input_dir", str(ind) + "/",
        "--output_dir", out,
        "--model_for_cond", str(tmp_path / "condmodel" / "model_best"),
        "--run_diff", "--model_type", "unet", "--enc_ratios", "8",
        "--rep_dims", "16", "--diff_dims", "16", "--n_filters", "4", "--lstm", "0",
        "--scaling_global", "--unet_scale_cond",
        "--cond_enc_ratios", "8", "5", "4", "2", "--cond_bandwidth", "1.5",
        "--upsampling_ratios", "5", "4", "2",
        "--midway_t", "2", "--segment_s", "1.0", "--decode_batch", "2",
    ])
    audio, sr = read_wav(out + "long.wav")
    assert audio.shape[-1] == 30080 // 640 * 640
    assert np.isfinite(audio).all()
    assert 0.9 < np.abs(audio).max() <= 1.0 + 1e-5


def test_chain_start_reencode(tmp_path):
    """--chain_start reencode: the sdedit chain starts from the re-encoded
    codec decode (bitstream-only info) instead of the upsampled cond; the CLI
    must produce finite, per-file-normalized audio through that path."""
    from ladiffcodec_tpu.sample import main
    from ladiffcodec_tpu.train import build_cond_model
    from ladiffcodec_tpu.utils.checkpoint import save_checkpoint

    ind = tmp_path / "in"
    ind.mkdir()
    t = np.arange(16000) / 16000
    write_wav(ind / "f0.wav",
              (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32), 16000)

    class A:
        rep_dims, emb_dims, n_residual_layers, n_filters, lstm = 16, 16, 1, 4, 0
        cond_quantization, cond_bandwidth, final_activation = True, 1.5, None
        cond_enc_ratios = [8, 5, 4, 2]

    cond = build_cond_model(A, quantization=True)
    v = cond.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 1)))
    save_checkpoint(v, str(tmp_path), "condmodel", note="best")

    out = str(tmp_path / "outs") + "/"
    main([
        "--input_dir", str(ind) + "/",
        "--output_dir", out,
        "--model_for_cond", str(tmp_path / "condmodel" / "model_best"),
        "--run_diff", "--model_type", "unet", "--enc_ratios", "8",
        "--rep_dims", "16", "--diff_dims", "16", "--n_filters", "4", "--lstm", "0",
        "--scaling_global", "--unet_scale_cond",
        "--cond_enc_ratios", "8", "5", "4", "2", "--cond_bandwidth", "1.5",
        "--upsampling_ratios", "5", "4", "2",
        "--sampler", "sdedit", "--chain_start", "reencode", "--midway_t", "2",
    ])
    audio, sr = read_wav(out + "f0.wav")
    assert np.isfinite(audio).all()
    assert 0.9 < np.abs(audio).max() <= 1.0 + 1e-5


@pytest.mark.parametrize("sampler", ["onestep", "ddim_deq"])
def test_deterministic_dequantization_samplers(tmp_path, sampler):
    """--sampler onestep/ddim_deq (deterministic dequantization,
    diag_sampler5): the chain start is fed as x_t at midway_t with NO fresh
    noise; the CLI must produce finite, per-file-normalized audio, and the
    output must be deterministic (two runs bit-identical)."""
    from ladiffcodec_tpu.sample import main
    from ladiffcodec_tpu.train import build_cond_model
    from ladiffcodec_tpu.utils.checkpoint import save_checkpoint

    ind = tmp_path / "in"
    ind.mkdir()
    t = np.arange(16000) / 16000
    write_wav(ind / "f0.wav",
              (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32), 16000)

    class A:
        rep_dims, emb_dims, n_residual_layers, n_filters, lstm = 16, 16, 1, 4, 0
        cond_quantization, cond_bandwidth, final_activation = True, 1.5, None
        cond_enc_ratios = [8, 5, 4, 2]

    cond = build_cond_model(A, quantization=True)
    v = cond.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 1)))
    save_checkpoint(v, str(tmp_path), "condmodel", note="best")

    args = [
        "--model_for_cond", str(tmp_path / "condmodel" / "model_best"),
        "--run_diff", "--model_type", "unet", "--enc_ratios", "8",
        "--rep_dims", "16", "--diff_dims", "16", "--n_filters", "4", "--lstm", "0",
        "--scaling_global", "--unet_scale_cond",
        "--cond_enc_ratios", "8", "5", "4", "2", "--cond_bandwidth", "1.5",
        "--upsampling_ratios", "5", "4", "2",
        "--sampler", sampler, "--chain_start", "reencode", "--midway_t", "3",
        "--sampling_timesteps", "2",
    ]
    out_a = str(tmp_path / "outs_a") + "/"
    out_b = str(tmp_path / "outs_b") + "/"
    main(["--input_dir", str(ind) + "/", "--output_dir", out_a] + args)
    main(["--input_dir", str(ind) + "/", "--output_dir", out_b] + args)
    a, _ = read_wav(out_a + "f0.wav")
    b, _ = read_wav(out_b + "f0.wav")
    assert np.isfinite(a).all()
    assert 0.9 < np.abs(a).max() <= 1.0 + 1e-5
    np.testing.assert_array_equal(a, b)
