"""Hinge GAN + feature-matching losses (reference srcs/train.py:57-107)."""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp


def gen_loss(
    disc_real: tp.Sequence[jnp.ndarray],
    fmap_real: tp.Sequence[tp.Sequence[jnp.ndarray]],
    disc_gen: tp.Sequence[jnp.ndarray],
    fmap_gen: tp.Sequence[tp.Sequence[jnp.ndarray]],
):
    """(l_g, l_feat): hinge generator loss + normalized L1 feature matching,
    both averaged 1/K (and 1/(K·L) over layers) — reference train.py:69-85."""
    K = len(fmap_gen)
    L = len(fmap_gen[0])
    l_g = 0.0
    l_feat = 0.0
    for d in range(K):
        l_g = l_g + jnp.mean(jnp.maximum(0.0, 1.0 - disc_gen[d])) / K
        for l in range(L):
            num = jnp.mean(jnp.abs(fmap_real[d][l] - fmap_gen[d][l]))
            den = jnp.mean(jnp.abs(fmap_real[d][l]))
            l_feat = l_feat + num / den / (K * L)
    return l_g, l_feat


def disc_loss(
    disc_real: tp.Sequence[jnp.ndarray], disc_gen: tp.Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """Hinge discriminator loss (reference train.py:87-107); generator logits
    must already be stop-gradiented by the caller."""
    K = len(disc_real)
    l_d = 0.0
    for d in range(K):
        l_d = l_d + jnp.mean(
            jnp.maximum(0.0, 1.0 - disc_real[d]) + jnp.maximum(0.0, 1.0 + disc_gen[d])
        ) / K
    return l_d
