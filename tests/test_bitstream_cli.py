"""In-process drive of the compression CLI (wav -> .ecdc -> wav), tiny model."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ladiffcodec_tpu.data.audio_io import write_wav, read_wav


def test_bitstream_cli_roundtrip(tmp_path, monkeypatch):
    import ladiffcodec_tpu.bitstream.__main__ as cli
    from ladiffcodec_tpu.bitstream.encodec_model import EncodecModel
    from ladiffcodec_tpu.quantization.rvq import ResidualVectorQuantizer

    t = np.arange(4800) / 24000
    write_wav(tmp_path / "x.wav", (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32),
              24000)

    orig_init = EncodecModel.__init__

    def tiny_init(self, *a, **kw):
        kw["dimension"] = 16
        orig_init(self, *a, **kw)
        self.encoder = type(self.encoder)(
            channels=self.channels, causal=True, ratios=(8, 5, 4, 2), dimension=16,
            n_filters=4, lstm=0)
        self.decoder = type(self.decoder)(
            channels=self.channels, causal=True, ratios=(8, 5, 4, 2), dimension=16,
            n_filters=4, lstm=0)
        self.quantizer = ResidualVectorQuantizer(dimension=16, n_q=16, bins=1024,
                                                 kmeans_init=False)

    monkeypatch.setattr(EncodecModel, "__init__", tiny_init)

    ecdc = tmp_path / "x.ecdc"
    cli.main(["-b", "6", "--random-init", str(tmp_path / "x.wav"), str(ecdc), "-f"])
    assert ecdc.exists()
    kbps = 8 * os.path.getsize(ecdc) / 1000 / 0.2
    assert 5 < kbps < 9  # ~6 kbps + header on a 0.2 s file

    out = tmp_path / "x_dec.wav"
    cli.main(["--random-init", str(ecdc), str(out), "-f"])
    audio, sr = read_wav(out)
    assert sr == 24000 and audio.shape[-1] == 4800
    assert np.isfinite(audio).all()
