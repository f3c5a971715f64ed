"""labml-style DenoiseDiffusion used with `model_type='unet2d'`.

TPU-native counterpart of reference srcs/losses/ddpm_loss_lab.py:176-306:
linear β ∈ [1e-4, 2e-2] over n_steps, σ² = β posterior, MSE ε loss.  Shape
agnostic (works on (B, T, C) latents or NHWC images).
"""

from __future__ import annotations

import typing as tp

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


def _gather(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    out = a[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


@struct.dataclass
class DenoiseDiffusion:
    beta: jnp.ndarray
    alpha: jnp.ndarray
    alpha_bar: jnp.ndarray

    @classmethod
    def create(cls, n_steps: int = 1000) -> "DenoiseDiffusion":
        beta = np.linspace(0.0001, 0.02, n_steps, dtype=np.float64)
        alpha = 1.0 - beta
        alpha_bar = np.cumprod(alpha)
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(beta=f32(beta), alpha=f32(alpha), alpha_bar=f32(alpha_bar))

    @property
    def n_steps(self) -> int:
        return self.beta.shape[0]

    def predict_start(self, x_t, t, eps_hat):
        sra = jnp.sqrt(1.0 / self.alpha_bar)
        srm1 = jnp.sqrt(1.0 / self.alpha_bar - 1.0)
        return _gather(sra, t, x_t.ndim) * x_t - _gather(srm1, t, x_t.ndim) * eps_hat

    def q_sample(self, x0, t, eps):
        mean = jnp.sqrt(_gather(self.alpha_bar, t, x0.ndim)) * x0
        var = 1.0 - _gather(self.alpha_bar, t, x0.ndim)
        return mean + jnp.sqrt(var) * eps

    def p_sample(self, eps_model, xt, t, key):
        eps_theta = eps_model(xt, t)
        alpha_bar = _gather(self.alpha_bar, t, xt.ndim)
        alpha = _gather(self.alpha, t, xt.ndim)
        eps_coef = (1.0 - alpha) / jnp.sqrt(1.0 - alpha_bar)
        mean = (xt - eps_coef * eps_theta) / jnp.sqrt(alpha)
        var = _gather(self.beta, t, xt.ndim)
        eps = jax.random.normal(key, xt.shape, xt.dtype)
        return mean + jnp.sqrt(var) * eps

    def sample_loop(self, eps_model, shape, key, t_start: tp.Optional[int] = None):
        """Full reverse chain as a lax.scan (the reference loops in Python)."""
        t_start = t_start or self.n_steps
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, shape)

        def step(carry, t_scalar):
            x, key = carry
            key, sub = jax.random.split(key)
            B = x.shape[0]
            t = jnp.full((B,), t_scalar, jnp.int32)
            x = self.p_sample(eps_model, x, t, sub)
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, key), jnp.arange(t_start - 1, -1, -1))
        return x

    def loss(self, eps_model, x0, key, t=None, noise=None):
        """Returns (mse, predicted_x0, noise, eps_theta, xt, t) — the exact
        reference tuple (ddpm_loss_lab.py:279-306)."""
        B = x0.shape[0]
        key_t, key_n = jax.random.split(key)
        if t is None:
            t = jax.random.randint(key_t, (B,), 0, self.n_steps)
        if noise is None:
            noise = jax.random.normal(key_n, x0.shape, x0.dtype)
        xt = self.q_sample(x0, t, noise)
        eps_theta = eps_model(xt, t)
        predicted_x0 = self.predict_start(xt, t, eps_theta)
        mse = jnp.mean((noise - eps_theta) ** 2)
        return mse, predicted_x0, noise, eps_theta, xt, t
