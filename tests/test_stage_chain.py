"""Stage chaining through real CLI checkpoints: stage-1 codec training saves
a TrainState checkpoint; stage-3 diffusion training loads it as the frozen
conditioning codec (reference workflow, README.md:41-63)."""

import numpy as np
import pytest

from ladiffcodec_tpu.data.audio_io import write_wav
pytestmark = pytest.mark.slow  # compile-heavy; excluded from `pytest -m 'not slow'`


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.RandomState(0)
    for split in ["train-clean-100", "dev-clean"]:
        d = tmp_path / "libri" / split / "1" / "c"
        d.mkdir(parents=True)
        for i in range(4):
            t = np.arange(16000) / 16000
            x = 0.3 * np.sin(2 * np.pi * (150 + 40 * i) * t) + 0.01 * rng.randn(16000)
            write_wav(d / f"1-{i}.wav", x.astype(np.float32), 16000)
    return str(tmp_path / "libri")


def test_stage1_checkpoint_feeds_stage3(corpus, tmp_path, monkeypatch):
    from ladiffcodec_tpu.train import main

    monkeypatch.chdir(tmp_path)  # logs/ go under tmp
    out = str(tmp_path / "saved")

    # stage 1: quantized codec (no GAN to keep the test fast), 1 outer step,
    # non-debug so the best checkpoint is written
    main([
        "--data_folder_path", corpus, "--seq_len_p_sec", "0.2",
        "--enc_ratios", "8", "5", "4", "2", "--quantization", "--bandwidth", "1.5",
        "--model_type", "unet", "--rep_dims", "16", "--emb_dims", "16",
        "--diff_dims", "16", "--n_filters", "4", "--lstm", "0",
        "--batch_size", "2", "--steps", "1", "--output_dir", out,
        "--exp_name", "codec15",
    ])
    import os

    assert os.path.isdir(os.path.join(out, "codec15", "model_best"))

    # stage 3: diffusion conditioned on the stage-1 checkpoint, with the
    # round-4 dequantization aux losses on (the r8 production recipe:
    # the codec decode is re-encoded inside the loss — this exercises the
    # cond_model.decode hookup in train.py/training.py end-to-end)
    main([
        "--data_folder_path", corpus, "--seq_len_p_sec", "0.32",
        "--enc_ratios", "8", "--run_diff", "--model_type", "unet",
        "--scaling_global", "--unet_scale_cond", "--freeze_ed",
        "--deq_weight", "1.0", "--deq_mel_weight", "0.01",
        "--model_for_cond", os.path.join(out, "codec15"),
        "--cond_enc_ratios", "8", "5", "4", "2", "--cond_quantization",
        "--cond_bandwidth", "1.5", "--upsampling_ratios", "5", "4", "2",
        "--seq_length", "640", "--rep_dims", "16", "--emb_dims", "16",
        "--diff_dims", "16", "--n_filters", "4", "--lstm", "0",
        "--batch_size", "2", "--debug",
    ])


def test_stage2_ae_finetunes_stage3(corpus, tmp_path, monkeypatch, capsys):
    """Stage-3 `--finetune_model <stage-2 AE>` partially restores the
    encoder/decoder even though the stage-3 TrainState has extra diff_model
    params (reference README.md:41-63 workflow)."""
    from ladiffcodec_tpu.train import main

    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "saved")

    # stage 2: continuous AE, non-debug so model_best is written
    main([
        "--data_folder_path", corpus, "--seq_len_p_sec", "0.2",
        "--enc_ratios", "8", "--model_type", "unet",
        "--rep_dims", "16", "--emb_dims", "16", "--diff_dims", "16",
        "--n_filters", "4", "--lstm", "0", "--batch_size", "2",
        "--steps", "1", "--output_dir", out, "--exp_name", "ae",
    ])
    import os

    ae_ckpt = os.path.join(out, "ae", "model_best")
    assert os.path.isdir(ae_ckpt)

    # stage 3: diffusion on top, loading the AE encoder/decoder
    main([
        "--data_folder_path", corpus, "--seq_len_p_sec", "0.32",
        "--enc_ratios", "8", "--run_diff", "--model_type", "unet",
        "--scaling_global", "--unet_scale_cond", "--freeze_ed",
        "--finetune_model", ae_ckpt,
        "--rep_dims", "16", "--emb_dims", "16", "--diff_dims", "16",
        "--n_filters", "4", "--lstm", "0", "--batch_size", "2", "--debug",
    ])
    assert "partial finetune restore" in capsys.readouterr().out
