"""Gradient-norm loss balancer (reference srcs/encodec/balancer.py:31-118).

JAX-native: per-loss gradients w.r.t. the model output come from `jax.vjp`
of each loss function at `s_hat`; their norms are EMA-averaged through an
explicit state pytree (psum'd over a mesh axis when given, replacing the
reference's `average_metrics` all-reduce); the rescaled combination becomes
the single cotangent pulled back through the network.

Usage inside a training step:

    s_hat, net_vjp = jax.vjp(apply_net, params)
    cot, new_bal_state, metrics = balancer.cotangent(bal_state, loss_fns, s_hat)
    (grads,) = net_vjp(cot)
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class BalancerState:
    total: tp.Dict[str, jnp.ndarray]
    fix: tp.Dict[str, jnp.ndarray]

    @classmethod
    def create(cls, names: tp.Sequence[str]) -> "BalancerState":
        z = {n: jnp.asarray(0.0, jnp.float32) for n in names}
        return cls(total=dict(z), fix=dict(z))


class Balancer:
    def __init__(
        self,
        weights: tp.Mapping[str, float],
        rescale_grads: bool = True,
        total_norm: float = 1.0,
        ema_decay: float = 0.999,
        per_batch_item: bool = True,
        epsilon: float = 1e-12,
        monitor: bool = False,
    ):
        self.weights = dict(weights)
        self.rescale_grads = rescale_grads
        self.total_norm = total_norm
        self.ema_decay = ema_decay
        self.per_batch_item = per_batch_item
        self.epsilon = epsilon
        self.monitor = monitor

    def init_state(self) -> BalancerState:
        return BalancerState.create(sorted(self.weights))

    def cotangent(
        self,
        state: BalancerState,
        loss_fns: tp.Mapping[str, tp.Callable[[jnp.ndarray], jnp.ndarray]],
        s_hat: jnp.ndarray,
        axis_name: tp.Optional[str] = None,
    ):
        """Returns (cotangent wrt s_hat, new_state, metrics)."""
        grads: tp.Dict[str, jnp.ndarray] = {}
        norms: tp.Dict[str, jnp.ndarray] = {}
        for name, fn in loss_fns.items():
            g = jax.grad(lambda s: jnp.asarray(fn(s), jnp.float32).sum())(s_hat)
            if self.per_batch_item:
                dims = tuple(range(1, g.ndim))
                norm = jnp.mean(jnp.sqrt(jnp.sum(g ** 2, axis=dims)))
            else:
                norm = jnp.sqrt(jnp.sum(g ** 2))
            grads[name] = g
            norms[name] = norm

        count = s_hat.shape[0] if self.per_batch_item else 1
        # EMA of norms (reference averager, balancer.py:10-28), then the
        # cross-worker metric average (distrib.average_metrics) as a pmean.
        new_total = {}
        new_fix = {}
        avg_norms = {}
        for name, norm in norms.items():
            t = state.total[name] * self.ema_decay + count * norm
            f = state.fix[name] * self.ema_decay + count
            new_total[name] = t
            new_fix[name] = f
            avg = t / f
            if axis_name is not None:
                avg = jax.lax.pmean(avg, axis_name)
            avg_norms[name] = avg

        total = sum(avg_norms.values())
        metrics = {}
        if self.monitor:
            for k, v in avg_norms.items():
                metrics[f"ratio_{k}"] = v / total

        total_weights = sum(self.weights[k] for k in avg_norms)
        ratios = {k: w / total_weights for k, w in self.weights.items()}

        out_grad = jnp.zeros_like(s_hat)
        for name, avg_norm in avg_norms.items():
            if self.rescale_grads:
                scale = ratios[name] * self.total_norm / (self.epsilon + avg_norm)
                out_grad = out_grad + scale * grads[name]
            else:
                out_grad = out_grad + self.weights[name] * grads[name]
        return out_grad, BalancerState(total=new_total, fix=new_fix), metrics
