"""Minimal dependency-free audio I/O: 16/24/32-bit PCM and float WAV via the
stdlib `wave`/`struct`, polyphase resampling via scipy.

Replaces the reference's torchaudio.load/save + functional.resample
(srcs/sample.py:83-84,136) without pulling torch into the data path.
"""

from __future__ import annotations

import struct
import wave
import typing as tp
from pathlib import Path

import numpy as np


def read_wav(path: tp.Union[str, Path]) -> tp.Tuple[np.ndarray, int]:
    """Returns (audio float32 (channels, L) in [-1, 1], sample_rate)."""
    path = str(path)
    with open(path, "rb") as f:
        header = f.read(12)
    if header[:4] == b"RIFF" and header[8:12] == b"WAVE":
        return _read_riff(path)
    raise ValueError(f"unsupported audio container for {path!r} (WAV only)")


def _read_riff(path: str) -> tp.Tuple[np.ndarray, int]:
    # Try stdlib wave first (handles plain PCM)
    try:
        with wave.open(path, "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            ch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(n)
        if width == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif width == 4:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        elif width == 3:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            x = (
                (b[:, 0].astype(np.int32))
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
        elif width == 1:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported sample width {width}")
        return x.reshape(-1, ch).T.copy(), sr
    except wave.Error:
        pass
    # Fall back to a manual chunk walk (IEEE float / extensible WAVs)
    with open(path, "rb") as f:
        data = f.read()
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    if fmt is None or pcm is None:
        raise ValueError(f"malformed WAV {path!r}")
    audio_fmt, ch, sr, _, _, bits = fmt
    if audio_fmt == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(pcm, dtype="<f4").astype(np.float32)
    elif audio_fmt == 1 and bits == 16:
        x = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
    else:
        raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}bit")
    return x.reshape(-1, ch).T.copy(), sr


def write_wav(
    path: tp.Union[str, Path], audio: np.ndarray, sample_rate: int, bits: int = 16
) -> None:
    """audio: (channels, L) or (L,) float in [-1, 1] -> PCM WAV."""
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    assert bits == 16, "only 16-bit PCM output supported"
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = np.round(pcm * 32767.0).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(audio.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.T.tobytes())


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (scipy), last axis = time."""
    if orig_sr == target_sr:
        return audio
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, target_sr)
    return resample_poly(audio, target_sr // g, orig_sr // g, axis=-1).astype(np.float32)


def convert_audio(
    audio: np.ndarray, sr: int, target_sr: int, target_channels: int
) -> np.ndarray:
    """Channel fold/expand + resample (reference srcs/encodec/utils.py:79-89)."""
    assert audio.shape[0] in (1, 2), "mono or stereo only"
    if target_channels == 1:
        audio = audio.mean(axis=0, keepdims=True)
    elif target_channels == 2:
        audio = np.broadcast_to(audio, (2, audio.shape[-1])).copy() if audio.shape[0] == 1 else audio
    return resample(audio, sr, target_sr)
