"""Diffusion noise schedules and closed-form conversions.

TPU-native re-design of the schedule/buffer machinery of the reference
(`CCDM_unified/diffusion.py:35-52` beta schedules, `:159-253` registered
buffers and SNR loss weights, `:260-293` conversions, `:487-499` q_sample).

Design: all schedule constants are precomputed once on the host in float64
(matching the reference's f64-then-cast-f32 discipline) and stored as a frozen
`Schedule` pytree of float32 device arrays. Every conversion is a pure
function of `(schedule, arrays, t)` so the whole thing inlines into a jitted
train/sample step; `extract` is a single gather that XLA fuses into the
surrounding elementwise math.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

OBJECTIVES = ("pred_noise", "pred_x0", "pred_v")


def linear_betas(timesteps: int) -> np.ndarray:
    """Linear beta schedule scaled so T=1000 spans [1e-4, 2e-2] (f64).

    Semantics of `CCDM_unified/diffusion.py:35-39`.
    """
    scale = 1000.0 / timesteps
    return np.linspace(scale * 0.0001, scale * 0.02, timesteps, dtype=np.float64)


def cosine_betas(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule of Nichol & Dhariwal (f64).

    Semantics of `CCDM_unified/diffusion.py:42-52`.
    """
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    ac = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1.0 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0.0, 0.999)


@struct.dataclass
class Schedule:
    """Frozen pytree of f32 schedule buffers (all shape [T])."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    snr: jax.Array
    loss_weight: jax.Array
    num_timesteps: int = struct.field(pytree_node=False)
    objective: str = struct.field(pytree_node=False)


def make_schedule(
    timesteps: int = 1000,
    beta_schedule: str = "cosine",
    objective: str = "pred_noise",
    min_snr_loss_weight: bool = False,
    min_snr_gamma: float = 5.0,
) -> Schedule:
    """Build all DDPM buffers in f64 then cast to f32 device arrays.

    Mirrors `CCDM_unified/diffusion.py:159-253` (incl. the per-objective SNR
    loss weight: pred_noise -> clipped/snr, pred_x0 -> clipped,
    pred_v -> clipped/(snr+1)).
    """
    if objective not in OBJECTIVES:
        raise ValueError(f"objective must be one of {OBJECTIVES}, got {objective}")
    if beta_schedule == "linear":
        betas = linear_betas(timesteps)
    elif beta_schedule == "cosine":
        betas = cosine_betas(timesteps)
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule}")

    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate([[1.0], ac[:-1]])

    posterior_variance = betas * (1.0 - ac_prev) / (1.0 - ac)
    snr = ac / (1.0 - ac)

    clipped_snr = np.minimum(snr, min_snr_gamma) if min_snr_loss_weight else snr
    if objective == "pred_noise":
        loss_weight = clipped_snr / snr
    elif objective == "pred_x0":
        loss_weight = clipped_snr
    else:  # pred_v
        loss_weight = clipped_snr / (snr + 1.0)

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return Schedule(
        betas=f32(betas),
        alphas_cumprod=f32(ac),
        alphas_cumprod_prev=f32(ac_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(ac)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - ac)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - ac)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / ac)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / ac - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(ac_prev) / (1.0 - ac)),
        posterior_mean_coef2=f32((1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)),
        snr=f32(snr),
        loss_weight=f32(loss_weight),
        num_timesteps=int(timesteps),
        objective=objective,
    )


def extract(buf: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather buf[t] and reshape to broadcast against an ndim-rank tensor."""
    out = buf[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def q_sample(sched: Schedule, x_start: jax.Array, t: jax.Array, noise: jax.Array,
             offset_noise_strength: float = 0.0, offset_noise: jax.Array | None = None) -> jax.Array:
    """Forward diffusion: x_t = sqrt(ac_t) x_0 + sqrt(1-ac_t) eps.

    NHWC layout. Optional offset noise (per-(batch,channel) scalar added to
    eps, `CCDM_unified/diffusion.py:490-494`).
    """
    if offset_noise_strength > 0.0 and offset_noise is not None:
        # offset_noise: [B, C] broadcast over spatial dims (NHWC -> B,1,1,C)
        noise = noise + offset_noise_strength * offset_noise[:, None, None, :]
    return (
        extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def predict_start_from_noise(sched: Schedule, x_t: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
    )


def predict_noise_from_start(sched: Schedule, x_t: jax.Array, t: jax.Array, x0: jax.Array) -> jax.Array:
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


def predict_v(sched: Schedule, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
    return (
        extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * noise
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * x_start
    )


def predict_start_from_v(sched: Schedule, x_t: jax.Array, t: jax.Array, v: jax.Array) -> jax.Array:
    return (
        extract(sched.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
    )


def q_posterior(sched: Schedule, x_start: jax.Array, x_t: jax.Array, t: jax.Array):
    """Mean / variance / clipped log-variance of q(x_{t-1} | x_t, x_0)."""
    mean = (
        extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
        + extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    var = extract(sched.posterior_variance, t, x_t.ndim)
    log_var = extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, var, log_var
