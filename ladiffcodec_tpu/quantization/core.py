"""Residual vector quantization with EMA codebook learning — pure-functional.

TPU-native counterpart of reference srcs/quantization/core_vq.py.  Design
differences from the torch original (all deliberate, SURVEY.md §2.8):

  * codebook state (embed / cluster_size / embed_avg / inited) is an explicit
    pytree (`RVQState`) threaded through pure functions — no in-place buffers;
  * all n_q stages are stored stacked (n_q, bins, dim) and the residual loop
    runs as ONE `lax.scan`, so XLA pipelines the per-stage matmuls instead of
    dispatching n_q kernels from Python (reference core_vq.py:324-342);
  * the nearest-code search is the expanded-matmul form −‖x−e‖² =
    2x·eᵀ − ‖e‖² (the x² term is constant in the argmax and dropped), one
    (N, dim) x (dim, bins) MXU matmul per stage (reference core_vq.py:174-182);
  * under data parallelism the EMA statistics (one-hot counts and embed sums)
    are `psum`-reduced across the mesh axis before the EMA update — strictly
    stronger than the reference's broadcast-only sync (core_vq.py:216-217);
  * k-means init and dead-code expiry run under explicit PRNG keys, so every
    replica takes the same decision by construction.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RVQState:
    """Stacked codebook state for n_q residual stages."""

    embed: jnp.ndarray  # (n_q, bins, dim)
    embed_avg: jnp.ndarray  # (n_q, bins, dim)
    cluster_size: jnp.ndarray  # (n_q, bins)
    inited: jnp.ndarray  # (n_q,) bool

    @property
    def n_q(self) -> int:
        return self.embed.shape[0]

    @property
    def bins(self) -> int:
        return self.embed.shape[1]

    @property
    def dim(self) -> int:
        return self.embed.shape[2]


def init_rvq_state(key: jax.Array, n_q: int, bins: int, dim: int, kmeans_init: bool = True) -> RVQState:
    """Fresh state.  With kmeans_init the codebooks start at zero and are
    filled by `kmeans_init_state` on the first batch (reference
    core_vq.py:125-137); otherwise kaiming-uniform like torch."""
    if kmeans_init:
        embed = jnp.zeros((n_q, bins, dim), jnp.float32)
    else:
        bound = jnp.sqrt(3.0) * jnp.sqrt(2.0 / (bins + dim))  # kaiming_uniform on (bins, dim)
        embed = jax.random.uniform(key, (n_q, bins, dim), jnp.float32, -bound, bound)
    return RVQState(
        embed=embed,
        embed_avg=embed,
        cluster_size=jnp.zeros((n_q, bins), jnp.float32),
        inited=jnp.full((n_q,), not kmeans_init, bool),
    )


def _sample_vectors(key: jax.Array, samples: jnp.ndarray, num: int) -> jnp.ndarray:
    """num rows drawn from samples — permutation without replacement when
    possible, uniform with replacement otherwise (reference core_vq.py:62-70).
    Static shapes: samples is (N, dim)."""
    n = samples.shape[0]
    if n >= num:
        idx = jax.random.permutation(key, n)[:num]
    else:
        idx = jax.random.randint(key, (num,), 0, n)
    return samples[idx]


def kmeans(key: jax.Array, samples: jnp.ndarray, num_clusters: int, num_iters: int = 10):
    """Plain Lloyd k-means, matmul distances, `lax.fori_loop` iterations.

    Returns (means (K, dim), bins (K,)).  Reference core_vq.py:73-95.
    """
    dim = samples.shape[-1]
    means0 = _sample_vectors(key, samples, num_clusters)

    def body(_, carry):
        means, _ = carry
        # dists: -(‖x‖² - 2x·eᵀ + ‖e‖²); full form needed? argmax over
        # clusters — ‖x‖² constant per sample, drop it.
        logits = 2.0 * samples @ means.T - jnp.sum(means * means, axis=-1)[None, :]
        buckets = jnp.argmax(logits, axis=-1)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)  # (N, K)
        counts = jnp.sum(onehot, axis=0)  # (K,)
        sums = onehot.T @ samples  # (K, dim)
        new_means = sums / jnp.maximum(counts, 1.0)[:, None]
        means = jnp.where((counts == 0)[:, None], means, new_means)
        return means, counts

    means, counts = jax.lax.fori_loop(
        0, num_iters, body, (means0, jnp.zeros((num_clusters,), samples.dtype))
    )
    return means, counts


def quantize_stage(
    x: jnp.ndarray, embed: jnp.ndarray, use_pallas: tp.Optional[bool] = None
) -> jnp.ndarray:
    """Nearest-code indices for one stage.  x: (..., dim), embed: (bins, dim).

    One MXU matmul + row-norm subtraction (reference core_vq.py:174-182).
    On TPU backends with lane-aligned shapes this dispatches to the fused
    Pallas kernel (ops/pallas_vq.py), which keeps the (N, bins) logits in
    VMEM instead of round-tripping them through HBM.
    """
    flat = x.reshape(-1, x.shape[-1])
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if use_pallas:
        from ..ops.pallas_vq import nearest_code_pallas, pallas_supported

        if pallas_supported(flat, embed):
            # indices are non-differentiable; stop_gradient keeps autodiff
            # from trying to linearize through the pallas_call
            return nearest_code_pallas(
                jax.lax.stop_gradient(flat), jax.lax.stop_gradient(embed)
            ).reshape(x.shape[:-1])
    logits = 2.0 * jnp.dot(flat, embed.T, preferred_element_type=jnp.float32)
    logits = logits - jnp.sum(embed.astype(jnp.float32) ** 2, axis=-1)[None, :]
    idx = jnp.argmax(logits, axis=-1)
    return idx.reshape(x.shape[:-1])


def dequantize_stage(codes: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(embed, codes, axis=0)


def kmeans_init_state(
    key: jax.Array, state: RVQState, x: jnp.ndarray, n_q: int, num_iters: int = 50
) -> RVQState:
    """Sequential k-means init over residual stages on the first batch.

    Mirrors the reference behavior where each stage's lazy `init_embed_`
    sees the residual left by the previous (already initialized) stages
    (core_vq.py:139-150 inside the 324-342 loop).  Host-level Python loop —
    runs once, each iteration is jittable.
    """
    flat = x.reshape(-1, x.shape[-1])
    residual = flat
    embed = state.embed
    embed_avg = state.embed_avg
    cluster_size = state.cluster_size
    inited = state.inited
    for q in range(n_q):
        key, sub = jax.random.split(key)
        means, counts = kmeans(sub, residual, state.bins, num_iters)
        already = inited[q]
        new_embed = jnp.where(already, embed[q], means)
        embed = embed.at[q].set(new_embed)
        embed_avg = embed_avg.at[q].set(jnp.where(already, embed_avg[q], means))
        cluster_size = cluster_size.at[q].set(jnp.where(already, cluster_size[q], counts))
        inited = inited.at[q].set(True)
        codes = quantize_stage(residual, new_embed)
        residual = residual - dequantize_stage(codes, new_embed)
    return RVQState(embed=embed, embed_avg=embed_avg, cluster_size=cluster_size, inited=inited)


class RVQOutput(tp.NamedTuple):
    quantized: jnp.ndarray  # (B, T, dim) straight-through in training
    codes: jnp.ndarray  # (n_q, B, T) int32
    commit_loss: jnp.ndarray  # (n_q,) per-stage commitment MSE
    state: RVQState  # updated (training) or unchanged state


def rvq_forward(
    state: RVQState,
    x: jnp.ndarray,
    n_q: int,
    *,
    training: bool,
    key: tp.Optional[jax.Array] = None,
    decay: float = 0.99,
    epsilon: float = 1e-5,
    threshold_ema_dead_code: float = 2.0,
    axis_name: tp.Optional[str] = None,
    expiry_compat: bool = False,
) -> RVQOutput:
    """Residual VQ over the first `n_q` stages as one `lax.scan`.

    x: (B, T, dim).  In training mode also applies the EMA codebook update
    (+ laplace-smoothed normalization) and dead-code expiry, the reference
    recipe (core_vq.py:205-229), with stats `psum`-reduced over `axis_name`
    when set.

    Dead-code expiry: in the reference the replacement written to `embed` is
    immediately overwritten by the EMA normalization (`embed =
    embed_avg/cluster_size` runs after `expire_codes_`, core_vq.py:218-227),
    so expiry is a no-op during training and the codebook relies entirely on
    k-means init to avoid collapse.  Here expiry is EFFECTIVE by default:
    expired codes also reset their EMA statistics (embed_avg <- replacement,
    cluster_size <- threshold) so revived codes survive the normalization.
    Set `expiry_compat=True` to reproduce the reference no-op exactly.
    """
    B, T, dim = x.shape
    assert 1 <= n_q <= state.n_q, (
        f"requested n_q={n_q} but codebook state holds {state.n_q} stages "
        "(bandwidth policy selected more quantizers than were constructed)"
    )
    flat = x.reshape(-1, dim)
    N = flat.shape[0]
    bins = state.bins

    embeds = state.embed[:n_q]
    avgs = state.embed_avg[:n_q]
    sizes = state.cluster_size[:n_q]
    if training:
        assert key is not None
        stage_keys = jax.random.split(key, n_q)
    else:
        stage_keys = jnp.zeros((n_q, 2), jnp.uint32)

    def stage(carry, inputs):
        residual = carry
        embed, avg, size, skey = inputs
        codes = quantize_stage(residual, embed)  # (N,)
        quant = dequantize_stage(codes, embed)  # (N, dim)

        if training:
            onehot = jax.nn.one_hot(codes, bins, dtype=jnp.float32)  # (N, bins)
            counts = jnp.sum(onehot, axis=0)  # (bins,)
            embed_sum = jnp.dot(onehot.T, residual, preferred_element_type=jnp.float32)
            if axis_name is not None:
                counts = jax.lax.psum(counts, axis_name)
                embed_sum = jax.lax.psum(embed_sum, axis_name)

            # dead-code expiry BEFORE the EMA update, as in the reference
            # (core_vq.py:215-218: expire first "as buffers are in sync").
            expired = size < threshold_ema_dead_code
            replacement = _sample_vectors(skey, residual, bins)
            if axis_name is not None:
                # take replica 0's samples so every replica writes the same
                # codebook (mask-psum broadcast, cheap: bins*dim floats).
                is0 = (jax.lax.axis_index(axis_name) == 0).astype(replacement.dtype)
                replacement = jax.lax.psum(replacement * is0, axis_name)
            embed = jnp.where(expired[:, None], replacement, embed)
            if not expiry_compat:
                # make the revival survive the EMA normalization below
                avg = jnp.where(expired[:, None], replacement * threshold_ema_dead_code, avg)
                size = jnp.where(expired, jnp.asarray(threshold_ema_dead_code, size.dtype), size)

            size = size * decay + counts * (1.0 - decay)
            avg = avg * decay + embed_sum * (1.0 - decay)
            smoothed = (size + epsilon) / (jnp.sum(size) + bins * epsilon) * jnp.sum(size)
            embed = avg / smoothed[:, None]

            # straight-through happens at the stack level; per-stage commit
            # loss compares the NON-straight-through quantized value.
            commit = jnp.mean((jax.lax.stop_gradient(quant) - residual) ** 2)
        else:
            commit = jnp.asarray(0.0, jnp.float32)

        new_residual = residual - jax.lax.stop_gradient(quant)
        return new_residual, (codes, quant, commit, embed, avg, size)

    residual0 = flat
    _, (codes, quants, commits, new_embeds, new_avgs, new_sizes) = jax.lax.scan(
        stage, residual0, (embeds, avgs, sizes, stage_keys)
    )

    quantized = jnp.sum(quants, axis=0).reshape(B, T, dim)
    if training:
        # straight-through estimator on the summed quantized latent
        quantized = flat.reshape(B, T, dim) + jax.lax.stop_gradient(
            quantized - flat.reshape(B, T, dim)
        )
        new_state = RVQState(
            embed=state.embed.at[:n_q].set(new_embeds),
            embed_avg=state.embed_avg.at[:n_q].set(new_avgs),
            cluster_size=state.cluster_size.at[:n_q].set(new_sizes),
            inited=state.inited,
        )
    else:
        new_state = state

    codes = codes.reshape(n_q, B, T)
    return RVQOutput(quantized=quantized, codes=codes.astype(jnp.int32), commit_loss=commits, state=new_state)


def rvq_encode(state: RVQState, x: jnp.ndarray, n_q: int) -> jnp.ndarray:
    """(B, T, dim) -> codes (n_q, B, T).  Reference core_vq.py:344-354."""
    out = rvq_forward(state, x, n_q, training=False)
    return out.codes


def rvq_decode(state: RVQState, codes: jnp.ndarray) -> jnp.ndarray:
    """codes (n_q, B, T) -> (B, T, dim).  Reference core_vq.py:356-362."""
    n_q = codes.shape[0]

    def stage(acc, inputs):
        embed, c = inputs
        return acc + dequantize_stage(c, embed), None

    acc0 = jnp.zeros(codes.shape[1:] + (state.dim,), state.embed.dtype)
    acc, _ = jax.lax.scan(stage, acc0, (state.embed[:n_q], codes))
    return acc
