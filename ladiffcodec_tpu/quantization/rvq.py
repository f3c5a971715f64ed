"""Bandwidth-driven residual vector quantizer facade.

TPU-native counterpart of reference srcs/quantization/vq.py: the
bandwidth→n_q policy (`bw_per_q = log2(bins)·frame_rate/1000` kbps,
`n_q = floor(bw / bw_per_q)`, vq.py:86-98) and a `QuantizedResult` container.

The policy runs on host ints so `n_q` is always static under jit.
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
from flax import struct

from .core import (
    RVQState,
    RVQOutput,
    init_rvq_state,
    kmeans_init_state,
    rvq_forward,
    rvq_encode,
    rvq_decode,
)


@struct.dataclass
class QuantizedResult:
    quantized: jnp.ndarray  # (B, T, dim)
    codes: jnp.ndarray  # (n_q, B, T)
    bandwidth: jnp.ndarray  # kb/s used
    penalty: tp.Optional[jnp.ndarray] = None
    state: tp.Optional[RVQState] = None


class ResidualVectorQuantizer:
    """Stateless config object + pure methods over an explicit RVQState.

    Reference srcs/quantization/vq.py:28-113 (defaults: bins=1024, n_q=8,
    decay=0.99, kmeans_init with 50 iters, dead-code threshold 2).
    """

    def __init__(
        self,
        dimension: int = 256,
        n_q: int = 8,
        bins: int = 1024,
        decay: float = 0.99,
        kmeans_init: bool = True,
        kmeans_iters: int = 50,
        threshold_ema_dead_code: float = 2.0,
    ):
        self.dimension = dimension
        self.n_q = n_q
        self.bins = bins
        self.decay = decay
        self.kmeans_init = kmeans_init
        self.kmeans_iters = kmeans_iters
        self.threshold_ema_dead_code = threshold_ema_dead_code

    # ---- state ----
    def init_state(self, key: jax.Array) -> RVQState:
        return init_rvq_state(key, self.n_q, self.bins, self.dimension, self.kmeans_init)

    def maybe_kmeans_init(self, key: jax.Array, state: RVQState, x: jnp.ndarray, n_q: tp.Optional[int] = None) -> RVQState:
        """Run on the first batch when kmeans_init is set (trainer calls it once)."""
        return kmeans_init_state(key, state, x, n_q or self.n_q, self.kmeans_iters)

    # ---- bandwidth policy (host ints, static under jit) ----
    def get_bandwidth_per_quantizer(self, frame_rate: float) -> float:
        return math.log2(self.bins) * frame_rate / 1000.0

    def get_num_quantizers_for_bandwidth(
        self, frame_rate: float, bandwidth: tp.Optional[float] = None
    ) -> int:
        bw_per_q = self.get_bandwidth_per_quantizer(frame_rate)
        n_q = self.n_q
        if bandwidth and bandwidth > 0.0:
            n_q = int(max(1, math.floor(bandwidth / bw_per_q)))
        return n_q

    # ---- forward / encode / decode ----
    def __call__(
        self,
        state: RVQState,
        x: jnp.ndarray,
        frame_rate: float,
        bandwidth: tp.Optional[float] = None,
        n_q: tp.Optional[int] = None,
        *,
        training: bool = False,
        key: tp.Optional[jax.Array] = None,
        axis_name: tp.Optional[str] = None,
    ) -> QuantizedResult:
        bw_per_q = self.get_bandwidth_per_quantizer(frame_rate)
        if n_q is None:
            n_q = self.get_num_quantizers_for_bandwidth(frame_rate, bandwidth)
        out: RVQOutput = rvq_forward(
            state,
            x,
            n_q,
            training=training,
            key=key,
            decay=self.decay,
            epsilon=1e-5,
            threshold_ema_dead_code=self.threshold_ema_dead_code,
            axis_name=axis_name,
        )
        bw = jnp.asarray(n_q * bw_per_q, x.dtype)
        return QuantizedResult(
            quantized=out.quantized,
            codes=out.codes,
            bandwidth=bw,
            penalty=jnp.mean(out.commit_loss),
            state=out.state,
        )

    def encode(
        self, state: RVQState, x: jnp.ndarray, frame_rate: float, bandwidth: tp.Optional[float] = None
    ) -> jnp.ndarray:
        n_q = self.get_num_quantizers_for_bandwidth(frame_rate, bandwidth)
        return rvq_encode(state, x, n_q)

    def decode(self, state: RVQState, codes: jnp.ndarray) -> jnp.ndarray:
        return rvq_decode(state, codes)
