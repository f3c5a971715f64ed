"""Utility coverage: debug dumps, StepTimer, param counting, logging format,
and the bitstream evaluation CLI."""

import os

import numpy as np
import jax.numpy as jnp

from ladiffcodec_tpu.utils.debug import save_plot, save_debug_wav, nn_parameters
from ladiffcodec_tpu.utils.logging import log_params, logging_step, StepTimer


def test_debug_dumps(tmp_path):
    x = np.sin(np.arange(1000) / 20.0)
    p = save_plot(x, "wave", "t0", out_dir=str(tmp_path))
    assert os.path.exists(p) and os.path.getsize(p) > 0
    w = save_debug_wav(x, "wave", "t0", out_dir=str(tmp_path))
    assert os.path.exists(w)


def test_nn_parameters():
    params = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros((5,))}}
    assert nn_parameters(params) == 17


def test_logging_files(tmp_path):
    log_params({"lr": 1e-3, "bs": 4}, "exp", log_dir=str(tmp_path))
    logging_step(5, {"loss": 1.0}, {"loss": 2.0}, 3.3, "exp", 2.0, log_dir=str(tmp_path))
    text = open(tmp_path / "exp.txt").read()
    assert "lr: 0.001" in text
    assert "step 5" in text and "best 2.0000" in text


def test_logging_empty_exp_name_goes_to_stdout(tmp_path, capsys):
    """Regression: empty --exp_name must not create logs/.txt (VERDICT r1 #8)."""
    log_params({"lr": 1e-3}, "", log_dir=str(tmp_path))
    logging_step(1, {"loss": 1.0}, {"loss": 2.0}, 0.1, "", 2.0, log_dir=str(tmp_path))
    assert not (tmp_path / ".txt").exists()
    out = capsys.readouterr().out
    assert "lr: 0.001" in out and "step 1" in out


def test_step_timer():
    t = StepTimer()
    t.mark("a")
    t.mark("b")
    assert set(t.phases) == {"a", "b"}
    assert all(v >= 0 for v in t.phases.values())


def test_evaluation_cli(tmp_path):
    from ladiffcodec_tpu.data.audio_io import write_wav

    d = tmp_path / "dev-clean" / "1" / "c"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        write_wav(d / f"1-{i}.wav", rng.randn(8000).astype(np.float32) * 0.2, 16000)

    import ladiffcodec_tpu.bitstream.evaluation as ev
    from ladiffcodec_tpu.bitstream.encodec_model import EncodecModel
    from ladiffcodec_tpu.quantization.rvq import ResidualVectorQuantizer

    # shrink the model the CLI builds so the test stays fast
    orig_init = EncodecModel.__init__

    def tiny_init(self, *a, **kw):
        kw["dimension"] = 16
        orig_init(self, *a, **kw)
        self.encoder = type(self.encoder)(
            channels=1, causal=True, ratios=(8, 5, 4, 2), dimension=16,
            n_filters=4, lstm=0)
        self.decoder = type(self.decoder)(
            channels=1, causal=True, ratios=(8, 5, 4, 2), dimension=16,
            n_filters=4, lstm=0)
        self.quantizer = ResidualVectorQuantizer(dimension=16, n_q=3, bins=1024,
                                                 kmeans_init=False)

    EncodecModel.__init__ = tiny_init
    try:
        ev.main([
            "--data_folder_path", str(tmp_path),
            "--output_dir", str(tmp_path / "eval"),
            "--bandwidth", "1.5", "--n_items", "1", "--seq_len_p_sec", "0.4",
        ])
    finally:
        EncodecModel.__init__ = orig_init
    outs = os.listdir(tmp_path / "eval")
    assert "0_ref.wav" in outs and "0_rec.wav" in outs


def test_npz_fallback_on_skeleton_checkpoint(tmp_path):
    """ADVICE r4 (medium): a fresh clone holds manifest-only orbax skeletons
    (the d/ array data is gitignored); load_checkpoint_path must fall back to
    the committed f16 snapshot params_f16.npz next to the checkpoint dir."""
    import numpy as np
    import pytest
    from ladiffcodec_tpu.utils.checkpoint import load_checkpoint_path

    exp = tmp_path / "exp"
    ckpt = exp / "model_best"
    ckpt.mkdir(parents=True)
    (ckpt / "_CHECKPOINT_METADATA").write_text("{}")  # skeleton, no data

    with pytest.raises(Exception):
        load_checkpoint_path(None, ckpt)

    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    np.savez_compressed(
        exp / "params_f16.npz",
        **{"params/dense/kernel": w.astype(np.float16),
           "step": np.asarray(7)})
    raw = load_checkpoint_path(None, ckpt)
    assert raw["params"]["dense"]["kernel"].dtype == np.float32
    np.testing.assert_allclose(raw["params"]["dense"]["kernel"], w)
