"""Audio I/O and dataset pipeline tests."""

import numpy as np
import pytest

from ladiffcodec_tpu.data.audio_io import read_wav, write_wav, resample, convert_audio
from ladiffcodec_tpu.data.librispeech import DatasetLibri, BatchLoader
from ladiffcodec_tpu.data.chunks import EnCodecData
from ladiffcodec_tpu.data.data_process import make_chunks


def test_wav_roundtrip(tmp_path):
    x = (np.random.RandomState(0).rand(2, 1000).astype(np.float32) - 0.5) * 0.9
    write_wav(tmp_path / "t.wav", x, 16000)
    y, sr = read_wav(tmp_path / "t.wav")
    assert sr == 16000 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1 / 32000)


def test_resample_tone():
    t = np.arange(16000) / 16000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    y = resample(x, 16000, 8000)
    assert y.shape == (1, 8000)
    # tone preserved: correlation with the 8 kHz-sampled tone is high
    t2 = np.arange(8000) / 8000
    ref = np.sin(2 * np.pi * 440 * t2)
    corr = np.corrcoef(y[0][100:-100], ref[100:-100])[0, 1]
    assert corr > 0.99


def test_convert_audio_channels():
    x = np.random.RandomState(0).randn(2, 100).astype(np.float32)
    assert convert_audio(x, 16000, 16000, 1).shape == (1, 100)
    m = np.random.RandomState(0).randn(1, 100).astype(np.float32)
    assert convert_audio(m, 16000, 16000, 2).shape == (2, 100)


@pytest.fixture()
def libri(tmp_path):
    rng = np.random.RandomState(0)
    for split in ["train-clean-100", "dev-clean"]:
        d = tmp_path / split / "9" / "x"
        d.mkdir(parents=True)
        for i in range(4):
            write_wav(d / f"9-{i}.wav", rng.randn(8000).astype(np.float32) * 0.2, 16000)
    return str(tmp_path)


def test_dataset_libri_crop_and_loader(libri):
    ds = DatasetLibri("train", seq_len_p_sec=0.25, data_folder_path=libri)
    seg = ds[0]
    assert seg.shape == (4000,)
    assert abs(np.abs(seg).max()) <= 1.0 + 1e-6

    loader = BatchLoader(ds, batch_size=2, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    assert batches[0].shape == (2, 4000, 1)

    # epoch changes the shuffle order deterministically
    loader.set_epoch(0)
    a = np.stack(list(loader))
    loader.set_epoch(0)
    b = np.stack(list(loader))
    np.testing.assert_array_equal(a, b)
    loader.set_epoch(1)
    c = np.stack(list(loader))
    assert not np.array_equal(a, c)


def test_loader_sharding(libri):
    ds = DatasetLibri("train", seq_len_p_sec=0.25, data_folder_path=libri)
    l0 = BatchLoader(ds, 1, shuffle=False, shard_index=0, shard_count=2)
    l1 = BatchLoader(ds, 1, shuffle=False, shard_index=1, shard_count=2)
    assert set(l0.indices).isdisjoint(set(l1.indices))
    assert len(set(l0.indices) | set(l1.indices)) == len(ds)


def test_chunks_pipeline(tmp_path, libri):
    n = make_chunks(libri + "/train-clean-100/**/*.wav", str(tmp_path / "chunks"),
                    seconds=0.25)
    assert n == 8  # 4 files x 2 chunks of 4000 samples each
    ds = EnCodecData(str(tmp_path / "chunks" / "*"), task="train", seq_len_p_sec=0.1)
    seg = ds[0]
    assert seg.shape == (1600,)
    assert np.abs(seg).max() <= 1.0  # /32768 normalization
    mixed = EnCodecData(str(tmp_path / "chunks" / "*"), task="train",
                        seq_len_p_sec=0.1, multi=True)[0]
    assert mixed.shape == (1600,)
