"""Host-side NumPy streaming LM for entropy coding — KV-cache design.

Why this exists (reference: srcs/encodec/compress.py:72-85, 126-141): the
arithmetic-coding loop is bit-serial — the decoder must run one LM step per
frame because each decoded symbol feeds the next prediction, and the encoder
must run the *identical* program so both ends build the same quantized CDFs.
That per-frame step has two costs the accelerator path cannot avoid:

  1. dispatch latency: one jitted call per frame (50/audio-second) — on a
     remote-tunnel TPU that is ~100-200 ms each; even on the in-process CPU
     backend the per-call overhead dominates the ~10 MFLOP of useful work;
  2. wasted FLOPs: the reference's streaming state (and our jax mirror in
     models/streaming_transformer.py) carries the raw layer *inputs*, so the
     k/v projections are recomputed over the whole 1000-frame history every
     step — ~800 MFLOP/step, ~100x the useful work.

This module is the framework's production entropy-coding engine: a plain
NumPy forward of the same trained weights with a per-layer **key/value ring
cache** — each step projects only the new frame (O(C^2)) and appends its
k/v to a fixed ring, exactly the design any streaming-decoder deployment
uses.  No jit, no device transfers, deterministic on both ends by running
the same code.  The jax path remains for parity tests and accelerator-local
runs; probabilities differ from this engine only at f32 rounding, but the
two engines' CDFs are NOT guaranteed bit-identical, so a stream must be
decoded by the engine that encoded it (compress.py pins both ends to the
same `lm_device` policy).

Numerics mirror models/streaming_transformer.py exactly: post-norm layers
(LN after the residual adds), tanh-approximate GELU (flax nn.gelu default),
LN eps 1e-5, f32 softmax with the bounded-past-context causal mask, and the
reference's one attendable zero frame at position -1
(transformer_encodec.py:105) — realized here by initializing the k/v rings
with the k/v projections of a zero input (= the Dense biases).
"""

from __future__ import annotations

import numpy as np


def _ln(x: np.ndarray, scale: np.ndarray, bias: np.ndarray, eps: float = 1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _gelu_tanh(x: np.ndarray) -> np.ndarray:
    # jax.nn.gelu(approximate=True): 0.5 x (1 + tanh(sqrt(2/pi)(x + 0.044715 x^3)))
    c = np.float32(np.sqrt(2.0 / np.pi))
    return np.float32(0.5) * x * (np.float32(1.0) + np.tanh(c * (x + np.float32(0.044715) * x * x * x)))


def _softmax_f32(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x, dtype=np.float32)
    return e / e.sum(axis=axis, keepdims=True)


def _np32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float32))


class NumpyLMEngine:
    """Streaming next-frame code probabilities from trained LMModel params.

    Usage (one independent stream; B=1):
        eng = NumpyLMEngine(lm_vars["params"], n_q=K)
        probs = eng.step(prev)   # prev: (K,) int, 1 + previous codes (0 = start)
        # probs: (K, card) float32 rows summing to 1
    """

    def __init__(self, params, n_q: int, card: int = 1024, dim: int = 200,
                 num_layers: int = 5, past_context: int = 1000, num_heads: int = 8):
        self.n_q = n_q
        self.card = card
        self.dim = dim
        self.num_layers = num_layers
        self.H = past_context
        self.heads = num_heads
        self.hd = dim // num_heads
        assert dim % num_heads == 0

        p = params
        self.emb = [_np32(p[f"emb_{k}"]["embedding"]) for k in range(n_q)]
        self.head_w = [_np32(p[f"linear_{k}"]["kernel"]) for k in range(n_q)]
        self.head_b = [_np32(p[f"linear_{k}"]["bias"]) for k in range(n_q)]
        tr = p["transformer"]
        self.norm_in = (_np32(tr["norm_in"]["scale"]), _np32(tr["norm_in"]["bias"]))
        self.layers = []
        for i in range(num_layers):
            l = tr[f"layer_{i}"]
            sa = l["self_attn"]
            self.layers.append({
                "wq": _np32(sa["q"]["kernel"]), "bq": _np32(sa["q"]["bias"]),
                "wk": _np32(sa["k"]["kernel"]), "bk": _np32(sa["k"]["bias"]),
                "wv": _np32(sa["v"]["kernel"]), "bv": _np32(sa["v"]["bias"]),
                "wo": _np32(sa["out"]["kernel"]), "bo": _np32(sa["out"]["bias"]),
                "ln1": (_np32(l["norm1"]["scale"]), _np32(l["norm1"]["bias"])),
                "ln2": (_np32(l["norm2"]["scale"]), _np32(l["norm2"]["bias"])),
                "w1": _np32(l["linear1"]["kernel"]), "b1": _np32(l["linear1"]["bias"]),
                "w2": _np32(l["linear2"]["kernel"]), "b2": _np32(l["linear2"]["bias"]),
            })
        # sinusoidal position table is cheap to compute per step; cache the
        # frequency row (cos half then sin half, streaming_transformer.py:23)
        half = dim // 2
        self.freq = (10000.0 ** (np.arange(half, dtype=np.float32) / (half - 1)))
        self.reset()

    def reset(self) -> None:
        """Start a new stream: t=0, rings hold the zero-frame k/v (= biases),
        which the mask exposes only at position -1 (the reference's single
        attendable init frame)."""
        self.t = 0
        self.k_ring = [np.broadcast_to(l["bk"], (self.H, self.dim)).copy()
                       for l in self.layers]
        self.v_ring = [np.broadcast_to(l["bv"], (self.H, self.dim)).copy()
                       for l in self.layers]

    def _mask_past(self) -> np.ndarray:
        """Boolean (H,) validity of ring slots for the query at position t.

        Slot j holds the largest position p <= t-1 with p ≡ j (mod H); valid
        iff p >= max(t - H, -1) — i.e. within the bounded context, with the
        zero frame (position -1, living in slot H-1 until overwritten)
        admitted exactly as the jax mask's `k_pos >= -1` does."""
        j = np.arange(self.H)
        p = j + self.H * ((self.t - 1 - j) // self.H)
        return p >= max(self.t - self.H, -1)

    def step(self, prev: np.ndarray) -> np.ndarray:
        """prev: (n_q,) int array of 1 + previous frame's codes (0 at t=0).
        Returns (n_q, card) float32 probabilities for the current frame."""
        H, C, nh, hd = self.H, self.dim, self.heads, self.hd
        x = np.zeros((C,), np.float32)
        for k in range(self.n_q):
            x = x + self.emb[k][int(prev[k])]

        x = _ln(x, *self.norm_in)
        phase = np.float32(self.t) / self.freq
        x = x + np.concatenate([np.cos(phase), np.sin(phase)]).astype(np.float32)

        valid = self._mask_past()
        slot = self.t % H
        scale = np.float32(hd ** -0.5)
        for i, l in enumerate(self.layers):
            sa_in = x
            q = sa_in @ l["wq"] + l["bq"]
            k_cur = sa_in @ l["wk"] + l["bk"]
            v_cur = sa_in @ l["wv"] + l["bv"]

            qh = q.reshape(nh, hd)
            kr = self.k_ring[i].reshape(H, nh, hd)
            vr = self.v_ring[i].reshape(H, nh, hd)
            s_past = np.einsum("hd,jhd->hj", qh, kr, optimize=True)  # (nh, H)
            s_cur = np.einsum("hd,hd->h", qh, k_cur.reshape(nh, hd))
            sim = np.concatenate([s_past, s_cur[:, None]], axis=1) * scale
            sim[:, :H][:, ~valid] = np.float32(-1e30)
            attn = _softmax_f32(sim)
            out = np.einsum("hj,jhd->hd", attn[:, :H], vr, optimize=True)
            out = out + attn[:, H:] * v_cur.reshape(nh, hd)
            mha = out.reshape(C) @ l["wo"] + l["bo"]

            x = _ln(sa_in + mha, *l["ln1"])
            h = _gelu_tanh(x @ l["w1"] + l["b1"])
            x = _ln(x + h @ l["w2"] + l["b2"], *l["ln2"])

            self.k_ring[i][slot] = k_cur
            self.v_ring[i][slot] = v_cur

        self.t += 1
        probs = np.empty((self.n_q, self.card), np.float32)
        for k in range(self.n_q):
            probs[k] = _softmax_f32(x @ self.head_w[k] + self.head_b[k])
        return probs
