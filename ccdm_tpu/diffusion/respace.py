"""Respaced diffusion schedules (ADM-G SpacedDiffusion parity).

TPU-native re-design of the guided-diffusion baseline's respacing
(`CCDM_vanilla/.../ADM_G/guided_diffusion/respace.py:63-130`): pick a subset
of the base timesteps, rebuild betas so the subset forms a valid chain
(beta'_i = 1 - ac[s_i]/ac[s_{i-1}]), and keep a timestep_map so the model is
always called with ORIGINAL timestep indices. Used for few-step ancestral
sampling with a model trained on the full schedule.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np

from ccdm_tpu.ops.schedule import Schedule, make_schedule
import jax.numpy as jnp


def space_timesteps(num_timesteps: int, section_counts) -> list:
    """ADM-G's section-based spacing (respace.py:10-60): 'ddimN' for DDIM
    striding, or a list of per-section counts."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return list(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} steps with striding")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        taken = []
        for _ in range(count):
            taken.append(start_idx + round(cur))
            cur += stride
        all_steps += taken
        start_idx += size
    return sorted(set(all_steps))


def make_respaced_schedule(
    timesteps: int,
    beta_schedule: str,
    objective: str,
    use_timesteps: Iterable[int],
    **schedule_kwargs,
) -> Tuple[Schedule, np.ndarray]:
    """(respaced Schedule over len(use_timesteps) steps, timestep_map).

    The returned Schedule's buffers index by NEW timestep; timestep_map[new]
    gives the ORIGINAL index to feed the model.
    """
    base = make_schedule(timesteps, beta_schedule, objective, **schedule_kwargs)
    ac = np.asarray(base.alphas_cumprod, np.float64)
    use = sorted(set(int(t) for t in use_timesteps))
    last = 1.0
    new_betas = []
    for t in use:
        new_betas.append(1.0 - ac[t] / last)
        last = ac[t]
    new_betas = np.asarray(new_betas)

    # rebuild all buffers from the respaced betas (same math as make_schedule)
    alphas = 1.0 - new_betas
    ac_new = np.cumprod(alphas)
    ac_prev = np.concatenate([[1.0], ac_new[:-1]])
    post_var = new_betas * (1.0 - ac_prev) / (1.0 - ac_new)
    snr = ac_new / (1.0 - ac_new)
    if objective == "pred_noise":
        lw = np.ones_like(snr)
    elif objective == "pred_x0":
        lw = snr
    else:
        lw = snr / (snr + 1.0)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    sched = Schedule(
        betas=f32(new_betas),
        alphas_cumprod=f32(ac_new),
        alphas_cumprod_prev=f32(ac_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(ac_new)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1 - ac_new)),
        log_one_minus_alphas_cumprod=f32(np.log(1 - ac_new)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1 / ac_new)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1 / ac_new - 1)),
        posterior_variance=f32(post_var),
        posterior_log_variance_clipped=f32(np.log(np.maximum(post_var, 1e-20))),
        posterior_mean_coef1=f32(new_betas * np.sqrt(ac_prev) / (1 - ac_new)),
        posterior_mean_coef2=f32((1 - ac_prev) * np.sqrt(alphas) / (1 - ac_new)),
        snr=f32(snr),
        loss_weight=f32(lw),
        num_timesteps=len(use),
        objective=objective,
    )
    return sched, np.asarray(use, np.int32)
