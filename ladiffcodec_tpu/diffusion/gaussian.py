"""Gaussian 1-D latent diffusion as pure functions over a precomputed schedule.

TPU-native counterpart of reference srcs/losses/ddpm_loss.py (lucidrains-style
`GaussianDiffusion1D`).  Differences by design:

  * the schedule is a pytree of arrays (`DiffusionSchedule`), computed once in
    float64 numpy and stored float32 (reference ddpm_loss.py:136-168);
  * every sampler is a single `lax.scan` over timesteps — the reference runs
    Python loops with one CUDA dispatch per step (ddpm_loss.py:253-385);
  * the training-loss "extra no-grad forward" that the reference uses to get
    `predicted_x_start` for decoding (ddpm_loss.py:418-421) is ONE model
    forward here: the model output is reused under `stop_gradient` instead of
    re-running the UNet (2x step speedup, identical math for
    self_condition=False configs, which is every shipped config);
  * the DDIM sampler the reference left permanently disabled
    (ddpm_loss.py:132) is exposed and jittable.

Layout: latents are (B, T, C).  Timesteps t are int32 (B,).
"""

from __future__ import annotations

import math
import typing as tp

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

ModelFn = tp.Callable[[jnp.ndarray, jnp.ndarray, tp.Optional[jnp.ndarray]], jnp.ndarray]


class ModelPrediction(tp.NamedTuple):
    pred_noise: jnp.ndarray
    pred_x_start: jnp.ndarray


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """Original DDPM linear schedule (reference ddpm_loss.py:41-48)."""
    scale = 1000 / timesteps
    return np.linspace(scale * 0.0001, scale * 0.02, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (reference ddpm_loss.py:50-60)."""
    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    alphas_cumprod = np.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int, start: float = -3, end: float = 3, tau: float = 1
) -> np.ndarray:
    """Sigmoid schedule (reference ddpm_loss.py:62-75)."""

    def sigmoid(x):
        return 1 / (1 + np.exp(-x))

    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    v_start = sigmoid(start / tau)
    v_end = sigmoid(end / tau)
    alphas_cumprod = (-sigmoid((t * (end - start) + start) / tau) + v_end) / (v_end - v_start)
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def shift_alphas_cumprod(alphas_cumprod: np.ndarray, snr_scale: float) -> np.ndarray:
    """Log-SNR shift:  ab' = s^2*ab / (1 - ab + s^2*ab)  (float64).

    SNR'_t = s^2 * SNR_t for every t, so data of per-element std ``1/s``
    sees the unit-std SNR trajectory of the unshifted schedule."""
    ab = np.asarray(alphas_cumprod, dtype=np.float64)
    s2 = float(snr_scale) ** 2
    return s2 * ab / (1.0 - ab + s2 * ab)


@struct.dataclass
class DiffusionSchedule:
    """All per-timestep buffers (float32, shape (T,))."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    p2_loss_weight: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    timesteps: int = 1000,
    beta_schedule: str = "cosine",
    p2_loss_weight_gamma: float = 0.0,
    p2_loss_weight_k: float = 1.0,
    snr_scale: float = 1.0,
) -> DiffusionSchedule:
    """Build the per-timestep schedule buffers.

    ``snr_scale`` applies a log-SNR shift to the base schedule:

        alpha-bar' = s^2 * ab / (1 - ab + s^2 * ab),   s = snr_scale

    so that data whose per-element std is ``1/s`` sees the same *effective*
    signal-to-noise trajectory as unit-std data under the unshifted schedule
    (SNR'_t * (1/s)^2 == SNR_t).  This matters because the reference
    normalizes latents by max-abs (srcs/model.py:122-143 divides by 18); a
    latent whose max-abs is ~1 but whose RMS is ~0.07 sits ~23 dB below the
    unit noise at every t, the eps-net can reach a low loss by copying its
    input, and every reverse-chain x0 readout amplifies the residual —
    measured round 3 as "more sampler steps make the latent strictly worse".
    Shifting the schedule (rather than rescaling the data) keeps the
    reference's halfway-chain contract intact: process_cond's max-abs-scaled
    output and the scaled target latent still live in the same ~[-1, 1] box.
    Same mechanism as the resolution-dependent schedule shift in
    simple-diffusion (Hoogeboom et al. 2023).
    """
    if beta_schedule == "linear":
        betas = linear_beta_schedule(timesteps)
    elif beta_schedule == "cosine":
        betas = cosine_beta_schedule(timesteps)
    elif beta_schedule == "sigmoid":
        betas = sigmoid_beta_schedule(timesteps)
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule}")

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    if snr_scale != 1.0:
        alphas_cumprod = shift_alphas_cumprod(alphas_cumprod, snr_scale)
        # re-derive betas so every downstream buffer (posterior variance /
        # mean coefficients, p2 weights, DDIM eta terms) stays self-consistent
        shifted_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
        alphas = alphas_cumprod / shifted_prev
        betas = np.clip(1.0 - alphas, 1e-12, 0.999)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        p2_loss_weight=f32(
            (p2_loss_weight_k + alphas_cumprod / (1 - alphas_cumprod)) ** -p2_loss_weight_gamma
        ),
    )


def _extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int,
             dtype: tp.Optional[jnp.dtype] = None) -> jnp.ndarray:
    """Gather per-example schedule values and broadcast to (B, 1, ..., 1).

    `dtype` casts the (tiny, per-example) coefficient so the big (B, T, C)
    elementwise products run in the carry dtype instead of promoting the
    whole chain to f32 — the schedule itself stays f32, only the broadcast
    scalar is cast.  A bf16 sampler carry halves the HBM traffic of the
    ~10 elementwise ops per denoise step (the f32 chain was the named
    compounding factor in the batch-32 regression, BASELINE.md)."""
    out = a[t]
    if dtype is not None:
        out = out.astype(dtype)
    return out.reshape(out.shape + (1,) * (ndim - 1))


@struct.dataclass
class GaussianDiffusion1D:
    """Config + schedule.  The denoiser is passed in as `model_fn(x, t, cond)`
    so this object stays a pure pytree (static fields marked as such)."""

    schedule: DiffusionSchedule
    objective: str = struct.field(pytree_node=False, default="pred_noise")
    loss_type: str = struct.field(pytree_node=False, default="l1")
    sampling_timesteps: tp.Optional[int] = struct.field(pytree_node=False, default=None)
    ddim_sampling_eta: float = struct.field(pytree_node=False, default=0.0)
    self_condition: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    # ---- q / prediction algebra (reference ddpm_loss.py:175-231) ----
    def predict_start_from_noise(self, x_t, t, noise):
        s = self.schedule
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim, x_t.dtype) * x_t
            - _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim, x_t.dtype) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        s = self.schedule
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim, x_t.dtype) * x_t - x0
        ) / _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim, x_t.dtype)

    def predict_v(self, x_start, t, noise):
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_start.ndim, x_start.dtype) * noise
            - _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim, x_start.dtype) * x_start
        )

    def predict_start_from_v(self, x_t, t, v):
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_t.ndim, x_t.dtype) * x_t
            - _extract(s.sqrt_one_minus_alphas_cumprod, t, x_t.ndim, x_t.dtype) * v
        )

    def q_posterior(self, x_start, x_t, t):
        s = self.schedule
        mean = (
            _extract(s.posterior_mean_coef1, t, x_t.ndim, x_t.dtype) * x_start
            + _extract(s.posterior_mean_coef2, t, x_t.ndim, x_t.dtype) * x_t
        )
        var = _extract(s.posterior_variance, t, x_t.ndim, x_t.dtype)
        log_var = _extract(s.posterior_log_variance_clipped, t, x_t.ndim, x_t.dtype)
        return mean, var, log_var

    def q_sample(self, x_start, t, noise):
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_start.ndim, x_start.dtype) * x_start
            + _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim, x_start.dtype) * noise
        )

    def model_predictions(
        self, model_fn: ModelFn, x, t, cond=None, clip_x_start: bool = False
    ) -> ModelPrediction:
        out = model_fn(x, t, cond)
        clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)
        if self.objective == "pred_noise":
            pred_noise = out
            x_start = clip(self.predict_start_from_noise(x, t, pred_noise))
        elif self.objective == "pred_x0":
            x_start = clip(out)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        elif self.objective == "pred_v":
            x_start = clip(self.predict_start_from_v(x, t, out))
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:
            raise ValueError(self.objective)
        return ModelPrediction(pred_noise, x_start)

    # ---- ancestral sampling (reference ddpm_loss.py:233-266) ----
    def p_sample_step(self, model_fn, x, t_scalar, cond, key, clip_denoised=True):
        """One ancestral step at (traced) scalar timestep t."""
        B = x.shape[0]
        t = jnp.full((B,), t_scalar, jnp.int32)
        preds = self.model_predictions(model_fn, x, t, cond)
        x_start = jnp.clip(preds.pred_x_start, -1.0, 1.0) if clip_denoised else preds.pred_x_start
        mean, _, log_var = self.q_posterior(x_start, x, t)
        noise = jax.random.normal(key, x.shape, x.dtype)
        noise = jnp.where(t_scalar > 0, noise, jnp.zeros_like(noise))
        return mean + jnp.exp(0.5 * log_var) * noise, x_start

    def _scan_ancestral(self, model_fn, img, cond, key, t_start: int, clip_denoised=True):
        """lax.scan over t = t_start-1 .. 0."""

        def step(carry, t_scalar):
            img, x_start, key = carry
            key, sub = jax.random.split(key)
            c = x_start if self.self_condition else cond
            img, x_start = self.p_sample_step(model_fn, img, t_scalar, c, sub, clip_denoised)
            return (img, x_start, key), None

        ts = jnp.arange(t_start - 1, -1, -1)
        (img, x_start, _), _ = jax.lax.scan(step, (img, jnp.zeros_like(img), key), ts)
        return img

    def p_sample_loop(self, model_fn, shape, key, cond=None, clip_denoised=True):
        """Full T-step ancestral sampler from pure noise (ddpm_loss.py:253-266)."""
        key, sub = jax.random.split(key)
        img = jax.random.normal(sub, shape)
        return self._scan_ancestral(model_fn, img, cond, key, self.num_timesteps, clip_denoised)

    def halfway_sampling(self, model_fn, img, t: int, key, cond=None, clip_denoised=True):
        """THE production sampler (reference ddpm_loss.py:370-385 +
        sample.py:130): start from the (already upsampled, max-abs normalized)
        condition and run only the last `t` ancestral steps."""
        return self._scan_ancestral(model_fn, img, cond, key, t, clip_denoised)

    # ---- DDIM (reference ddpm_loss.py:268-303, unreachable there) ----
    def ddim_sample(self, model_fn, shape, key, cond=None, clip_denoised=True,
                    sampling_timesteps: tp.Optional[int] = None):
        steps = sampling_timesteps or self.sampling_timesteps or self.num_timesteps
        key, sub = jax.random.split(key)
        img = jax.random.normal(sub, shape)
        return self.ddim_from(
            model_fn, img, self.num_timesteps, steps, key, cond, clip_denoised
        )

    def ddim_from(self, model_fn, img, t_start: int, steps: int, key, cond=None,
                  clip_denoised=True):
        """DDIM truncated to the last `t_start` noise levels, `steps` model
        calls — the fast TPU decode path (halfway_sampling quality at a
        fraction of the forwards; not in the reference)."""
        eta = self.ddim_sampling_eta
        times = np.linspace(-1, t_start - 1, steps + 1).astype(int)
        pairs = np.stack([times[1:][::-1], times[:-1][::-1]], axis=1)
        B = img.shape[0]
        s = self.schedule

        def step(carry, pair):
            img, x_start, key = carry
            time, time_next = pair[0], pair[1]
            t = jnp.full((B,), time, jnp.int32)
            c = x_start if self.self_condition else cond
            pred_noise, x_start = self.model_predictions(
                model_fn, img, t, c, clip_x_start=clip_denoised
            )
            alpha = s.alphas_cumprod[time]
            alpha_next = jnp.where(time_next < 0, 1.0, s.alphas_cumprod[jnp.maximum(time_next, 0)])
            sigma = eta * jnp.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
            coef = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma ** 2, 0.0))
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, img.shape, img.dtype)
            # scalar schedule coefficients are f32; cast so a bf16 chain stays
            # bf16 through the scan carry (the per-t paths go through
            # _extract(..., dtype) — this is the one indexed-scalar site)
            dt = img.dtype
            img_next = (x_start * jnp.sqrt(alpha_next).astype(dt)
                        + coef.astype(dt) * pred_noise + sigma.astype(dt) * noise)
            img = jnp.where(time_next < 0, x_start, img_next).astype(dt)
            return (img, x_start, key), None

        (img, _, _), _ = jax.lax.scan(step, (img, jnp.zeros_like(img), key), jnp.asarray(pairs))
        return img

    # ---- interpolate / infilling (reference ddpm_loss.py:311-367) ----
    def interpolate(self, model_fn, x1, x2, key, t: tp.Optional[int] = None, lam: float = 0.5):
        t = self.num_timesteps - 1 if t is None else t
        B = x1.shape[0]
        tb = jnp.full((B,), t, jnp.int32)
        key, k1, k2 = jax.random.split(key, 3)
        xt1 = self.q_sample(x1, tb, jax.random.normal(k1, x1.shape, x1.dtype))
        xt2 = self.q_sample(x2, tb, jax.random.normal(k2, x2.shape, x2.dtype))
        img = (1 - lam) * xt1 + lam * xt2
        return self._scan_ancestral(model_fn, img, None, key, t)

    def infilling(self, model_fn, infill_img, cond, midway_t: int, key, lam: float = 0.8):
        """Reference ddpm_loss.py:331-367: blend the denoising trajectory of a
        uniform-noise start with the (itself denoised) infill image."""
        B, T, C = cond.shape[0], infill_img.shape[1], infill_img.shape[2]
        key, sub = jax.random.split(key)
        img = jax.random.uniform(sub, (B, T, C), infill_img.dtype)

        def step(carry, t_scalar):
            img, infill, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            img, _ = self.p_sample_step(model_fn, img, t_scalar, cond, k1)
            img = (1 - lam) * img + lam * infill
            infill, _ = self.p_sample_step(model_fn, infill, t_scalar, cond, k2)
            img = (1 - lam) * img + lam * infill
            return (img, infill, key), None

        ts = jnp.arange(midway_t - 1, -1, -1)
        (img, _, _), _ = jax.lax.scan(step, (img, infill_img, key), ts)
        return img

    # ---- training loss (reference ddpm_loss.py:404-451) ----
    def p_losses(self, model_fn: ModelFn, x_start, t, key, cond=None):
        """Returns (loss, predicted_x_start, x_t).

        ONE model forward: `predicted_x_start` for the decoder SDR readout is
        the stop-gradient of the same output the loss uses (the reference
        runs the UNet twice, ddpm_loss.py:418-424; for self_condition=False
        both forwards see identical inputs, so this is exact, not an
        approximation).
        """
        noise = jax.random.normal(key, x_start.shape, x_start.dtype)
        x = self.q_sample(x_start, t, noise)
        x_cond = cond  # self-conditioning would swap in pred_x_start here
        model_out = model_fn(x, t, x_cond)

        if self.objective == "pred_noise":
            target = noise
            pred_x_start = self.predict_start_from_noise(x, t, model_out)
        elif self.objective == "pred_x0":
            target = x_start
            pred_x_start = model_out
        elif self.objective == "pred_v":
            target = self.predict_v(x_start, t, noise)
            pred_x_start = self.predict_start_from_v(x, t, model_out)
        else:
            raise ValueError(self.objective)

        if self.loss_type == "l1":
            loss = jnp.abs(model_out - target)
        elif self.loss_type == "l2":
            loss = (model_out - target) ** 2
        else:
            raise ValueError(self.loss_type)
        loss = jnp.mean(loss.reshape(loss.shape[0], -1), axis=1)
        loss = loss * self.schedule.p2_loss_weight[t]
        return jnp.mean(loss), jax.lax.stop_gradient(pred_x_start), x

    def __call__(self, model_fn: ModelFn, x, key, cond=None, t=None):
        """Training entry (reference ddpm_loss.py:443-451): draw t ~ U[0, T)
        unless given.  Returns (loss, predicted_x_start, x_t, t)."""
        B = x.shape[0]
        key_t, key_n = jax.random.split(key)
        if t is None:
            t = jax.random.randint(key_t, (B,), 0, self.num_timesteps)
        loss, pred_x_start, x_t = self.p_losses(model_fn, x, t, key_n, cond)
        return loss, pred_x_start, x_t, t
