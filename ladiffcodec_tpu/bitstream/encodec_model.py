"""EnCodec model wrapper: segment-wise encode/decode with volume
normalization and linear-crossfade overlap-add.

TPU-native counterpart of reference srcs/encodec/model.py:32-266.  The
networks are this repo's SEANet + functional RVQ; segmenting runs on host
(static per-segment shapes), per-segment encode/decode are jitted once.
"""

from __future__ import annotations

import math
import typing as tp


import numpy as np
import jax
import jax.numpy as jnp

from ..models.seanet import SEANetEncoder, SEANetDecoder
from ..quantization.rvq import ResidualVectorQuantizer
from ..quantization.core import RVQState

EncodedFrame = tp.Tuple[np.ndarray, tp.Optional[np.ndarray]]  # (codes (B,K,T), scale)


def linear_overlap_add(frames: tp.Sequence[np.ndarray], stride: int) -> np.ndarray:
    """Triangle-weighted overlap-add (reference encodec/utils.py:17-57).
    frames: list of (..., L_i) arrays."""
    assert len(frames)
    dtype = frames[0].dtype
    shape = frames[0].shape[:-1]
    total_size = stride * (len(frames) - 1) + frames[-1].shape[-1]

    frame_length = frames[0].shape[-1]
    t = np.linspace(0, 1, frame_length + 2, dtype=dtype)[1:-1]
    weight = 0.5 - np.abs(t - 0.5)

    sum_weight = np.zeros(total_size, dtype)
    out = np.zeros(shape + (total_size,), dtype)
    offset = 0
    for frame in frames:
        fl = frame.shape[-1]
        out[..., offset : offset + fl] += weight[:fl] * frame
        sum_weight[offset : offset + fl] += weight[:fl]
        offset += stride
    assert sum_weight.min() > 0
    return out / sum_weight


class EncodecModel:
    """Config + jitted segment codecs over explicit variables.

    Variables layout: {"encoder": params, "decoder": params, "rvq": RVQState}.
    """

    def __init__(
        self,
        target_bandwidths: tp.Sequence[float],
        sample_rate: int = 24_000,
        channels: int = 1,
        causal: bool = True,
        model_norm: str = "weight_norm",
        audio_normalize: bool = False,
        segment: tp.Optional[float] = None,
        overlap: float = 0.01,
        name: str = "unset",
        ratios: tp.Sequence[int] = (8, 5, 4, 2),
        dimension: int = 128,
        bins: int = 1024,
    ):
        self.target_bandwidths = list(target_bandwidths)
        self.sample_rate = sample_rate
        self.channels = channels
        self.normalize = audio_normalize
        self.segment = segment
        self.overlap = overlap
        self.name = name
        self.bins = bins
        self.bandwidth: tp.Optional[float] = None

        self.encoder = SEANetEncoder(
            channels=channels, norm=model_norm, causal=causal, ratios=tuple(ratios),
            dimension=dimension,
        )
        self.decoder = SEANetDecoder(
            channels=channels, norm=model_norm, causal=causal, ratios=tuple(ratios),
            dimension=dimension,
        )
        self.frame_rate = math.ceil(sample_rate / np.prod(ratios))
        n_q = int(1000 * self.target_bandwidths[-1] // (self.frame_rate * 10))
        self.quantizer = ResidualVectorQuantizer(dimension=dimension, n_q=n_q, bins=bins)
        self.bits_per_codebook = int(math.log2(bins))
        assert 2 ** self.bits_per_codebook == bins

        self._encode_jit: tp.Dict[tp.Tuple[int, int], tp.Any] = {}
        self._decode_jit: tp.Dict[tp.Tuple[int, int], tp.Any] = {}

    # ---- variables ----
    def init_variables(self, key: jax.Array, example_len: int = 24000):
        k1, k2, k3 = jax.random.split(key, 3)
        x = jnp.zeros((1, example_len, self.channels))
        enc = self.encoder.init(k1, x)["params"]
        z = self.encoder.apply({"params": enc}, x)
        dec = self.decoder.init(k2, z)["params"]
        rvq = self.quantizer.init_state(k3)
        if self.quantizer.kmeans_init:
            # codebooks must be usable out of the box for random-init tests
            rvq = self.quantizer.maybe_kmeans_init(
                k3, rvq, jax.random.normal(k3, (1, 128, self.quantizer.dimension))
            )
        return {"encoder": enc, "decoder": dec, "rvq": rvq}

    # ---- properties (reference model.py:73-84) ----
    @property
    def segment_length(self) -> tp.Optional[int]:
        if self.segment is None:
            return None
        return int(self.segment * self.sample_rate)

    @property
    def segment_stride(self) -> tp.Optional[int]:
        sl = self.segment_length
        if sl is None:
            return None
        return max(1, int((1 - self.overlap) * sl))

    def set_target_bandwidth(self, bandwidth: float) -> None:
        if bandwidth not in self.target_bandwidths:
            raise ValueError(
                f"This model doesn't support the bandwidth {bandwidth}. "
                f"Select one of {self.target_bandwidths}."
            )
        self.bandwidth = bandwidth

    # ---- jitted per-segment paths ----
    def _encode_frame_fn(self, n_q: int, length: int):
        key = (n_q, length)
        if key not in self._encode_jit:

            @jax.jit
            def f(variables, x):
                if self.normalize:
                    mono = jnp.mean(x, axis=-1, keepdims=True)
                    volume = jnp.sqrt(jnp.mean(mono ** 2, axis=1, keepdims=True))
                    scale = 1e-8 + volume
                    x = x / scale
                    scale = scale.reshape(-1, 1)
                else:
                    scale = None
                emb = self.encoder.apply({"params": variables["encoder"]}, x)
                from ..quantization.core import rvq_encode

                codes = rvq_encode(variables["rvq"], emb, n_q)  # (K, B, T)
                return jnp.transpose(codes, (1, 0, 2)), scale

            self._encode_jit[key] = f
        return self._encode_jit[key]

    def _decode_frame_fn(self, n_q: int, length: int):
        key = (n_q, length)
        if key not in self._decode_jit:

            @jax.jit
            def f(variables, codes, scale):
                from ..quantization.core import rvq_decode

                emb = rvq_decode(variables["rvq"], jnp.transpose(codes, (1, 0, 2)))
                out = self.decoder.apply({"params": variables["decoder"]}, emb)
                if scale is not None:
                    out = out * scale.reshape(-1, 1, 1)
                return out

            self._decode_jit[key] = f
        return self._decode_jit[key]

    # ---- public API (reference model.py:86-155) ----
    def encode(self, variables, x: np.ndarray) -> tp.List[EncodedFrame]:
        """x: (B, L, channels) -> list of (codes (B, K, T), scale)."""
        assert x.ndim == 3
        length = x.shape[1]
        segment_length = self.segment_length or length
        stride = self.segment_stride or length
        n_q = self.quantizer.get_num_quantizers_for_bandwidth(self.frame_rate, self.bandwidth)

        frames: tp.List[EncodedFrame] = []
        for offset in range(0, length, stride):
            frame = x[:, offset : offset + segment_length]
            f = self._encode_frame_fn(n_q, frame.shape[1])
            codes, scale = f(variables, jnp.asarray(frame))
            frames.append((np.asarray(codes), None if scale is None else np.asarray(scale)))
        return frames

    def decode(self, variables, encoded_frames: tp.List[EncodedFrame]) -> np.ndarray:
        """-> (B, L, channels) waveform (possibly slightly longer than input)."""
        segment_length = self.segment_length
        outs = []
        n_q = encoded_frames[0][0].shape[1]
        for codes, scale in encoded_frames:
            f = self._decode_frame_fn(n_q, codes.shape[-1])
            out = f(
                variables,
                jnp.asarray(codes),
                None if scale is None else jnp.asarray(scale),
            )
            outs.append(np.asarray(out))
        if segment_length is None:
            assert len(outs) == 1
            return outs[0]
        # overlap-add over the time axis: (B, L, C) -> put time last
        frames_t = [np.moveaxis(o, 1, -1) for o in outs]
        merged = linear_overlap_add(frames_t, self.segment_stride or 1)
        return np.moveaxis(merged, -1, 1)

    def forward(self, variables, x: np.ndarray) -> np.ndarray:
        frames = self.encode(variables, x)
        return self.decode(variables, frames)[:, : x.shape[1]]

    __call__ = forward

    # ---- factories (reference model.py:228-266, minus URL download: this
    # container has zero egress; pass converted weights explicitly) ----
    @staticmethod
    def encodec_model_24khz() -> "EncodecModel":
        return EncodecModel(
            target_bandwidths=[1.5, 3.0, 6.0, 12.0, 24.0],
            sample_rate=24_000,
            channels=1,
            causal=True,
            model_norm="weight_norm",
            audio_normalize=False,
            name="encodec_24khz",
        )

    @staticmethod
    def encodec_model_48khz() -> "EncodecModel":
        return EncodecModel(
            target_bandwidths=[3.0, 6.0, 12.0, 24.0],
            sample_rate=48_000,
            channels=2,
            causal=False,
            model_norm="time_group_norm",
            audio_normalize=True,
            segment=1.0,
            name="encodec_48khz",
        )
