"""EncodecModel-compatible facade over the LaDiffCodec discrete codec.

The .ecdc container, BitPacker and LM arithmetic coder in this package are
written against the EncodecModel interface (encode -> frames of codes,
decode <- frames).  This adapter exposes the flagship 16 kHz hop-320
SEANet+RVQ codec (models/diff_rep.py) through that interface, so the full
entropy-coding stack — including `--lm` — runs over the codec the
LaDiffCodec pipeline actually ships, not only the vendored 24/48 kHz
EnCodec configs.  (The reference never wires its own codec into the ecdc
tooling; srcs/encodec is a standalone sub-project — SURVEY.md §2.7.)
"""

from __future__ import annotations

import math
import typing as tp

import numpy as np
import jax
import jax.numpy as jnp

from ..models.diff_rep import DiffAudioRep

EncodedFrame = tp.Tuple[np.ndarray, tp.Optional[np.ndarray]]


class LaDiffBitstreamModel:
    """Wraps DiffAudioRep(quantization=True) for compress.py/decompress."""

    def __init__(self, codec: DiffAudioRep, name: str = "ladiff_16khz"):
        assert codec.quantization, "bitstream needs the discrete codec"
        self.codec = codec
        self.name = name
        self.sample_rate = codec.sample_rate
        self.channels = 1
        self.normalize = False
        self.segment_length = None  # whole-utterance frames (no overlap-add)
        self.segment_stride = None
        self.frame_rate = math.ceil(codec.sample_rate / codec.hop_length)
        self.bits_per_codebook = int(math.log2(codec.bins))
        self._encode = jax.jit(
            lambda v, x: codec.apply(v, x, method="encode_codes")
        )
        self._decode = jax.jit(
            lambda v, c: codec.apply(v, c, method="decode_codes")
        )

    def encode(self, variables, x) -> tp.List[EncodedFrame]:
        """x: (1, L, C) -> [(codes (1, K, T), None)]."""
        codes = np.asarray(self._encode(variables, jnp.asarray(x)))  # (K, B, T)
        return [(codes.transpose(1, 0, 2), None)]

    def decode(self, variables, frames: tp.Sequence[EncodedFrame]) -> np.ndarray:
        assert len(frames) == 1, "adapter encodes whole utterances"
        codes, _ = frames[0]  # (1, K, T)
        codes = jnp.asarray(np.asarray(codes).transpose(1, 0, 2))  # (K, 1, T)
        return np.asarray(self._decode(variables, codes))  # (1, L, 1)
