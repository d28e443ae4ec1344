"""Fidelity-contract tests (SURVEY.md §7.3-2, VERDICT weak-5).

Two bounds the round-1 review found untested:
1. The f32 guidance epilogue (apply_cfg incl. parallel-component removal,
   which the reference runs in float64 — CCDM_unified/models/unet.py:51-62)
   must track an f64 oracle through a FULL DDIM chain, not just per-op.
2. bf16 activations (--train_amp) must produce samples close to the f32
   pipeline on a fixed seed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
from ccdm_tpu.embedding import make_fn_y2h
from ccdm_tpu.models import Unet

IMG, NC, B, STEPS = 16, 3, 4, 10


def _build(dtype=jnp.float32):
    model = Unet(dim=16, dim_mults=(1, 2), in_channels=NC,
                 attn_heads=1, attn_dim_head=16, dtype=dtype)
    return model


@pytest.fixture(scope="module")
def setup():
    model = _build()
    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, jnp.zeros((2, IMG, IMG, NC)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 128)), None, train=False,
    )
    fn_y2h = make_fn_y2h(128)
    labels = jnp.linspace(0.2, 0.8, B)
    emb = fn_y2h(labels)
    return model, variables, emb


def _f64_oracle_ddim(model, variables, emb, key, cond_scale, rescaled_phi,
                     timesteps, sampling_timesteps):
    """DDIM chain with the UNet in f32 but ALL guidance + conversion + update
    algebra in float64 numpy (the reference's `project` precision,
    models/unet.py:51-62). Mirrors GaussianDiffusion.ddim_sample eta=0."""
    from ccdm_tpu.ops.schedule import make_schedule

    sched = make_schedule(timesteps, "cosine", "pred_x0")
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    sr = np.asarray(sched.sqrt_recip_alphas_cumprod, np.float64)
    srm1 = np.asarray(sched.sqrt_recipm1_alphas_cumprod, np.float64)

    times = np.linspace(-1, timesteps - 1, sampling_timesteps + 1).astype(np.int64)
    times = list(reversed(times.tolist()))
    pairs = list(zip(times[:-1], times[1:]))

    k_init, _ = jax.random.split(key)
    img = np.asarray(
        jax.random.normal(k_init, (B, IMG, IMG, NC)), np.float64
    )

    @jax.jit
    def unet2(x2, t2, e2, keep2):
        return model.apply(variables, x2, t2, e2, keep2, train=False)

    for time, time_next in pairs:
        x32 = jnp.asarray(img, jnp.float32)
        t2 = jnp.full((2 * B,), time, jnp.int32)
        x2 = jnp.concatenate([x32, x32])
        e2 = jnp.concatenate([emb, emb])
        keep2 = jnp.concatenate([jnp.ones((B,), bool), jnp.zeros((B,), bool)])
        out2 = np.asarray(unet2(x2, t2, e2, keep2), np.float64)
        logits, null_logits = out2[:B], out2[B:]

        # f64 guidance: parallel-component removal exactly as unet.py:51-62
        update = logits - null_logits
        xf = update.reshape(B, -1)
        yf = logits.reshape(B, -1)
        unit = yf / np.linalg.norm(yf, axis=-1, keepdims=True)
        parallel = (xf * unit).sum(-1, keepdims=True) * unit
        update = (xf - parallel).reshape(update.shape)
        scaled = logits + update * (cond_scale - 1.0)
        if rescaled_phi != 0.0:
            std_c = logits.std(axis=(1, 2, 3), keepdims=True, ddof=0)
            std_s = scaled.std(axis=(1, 2, 3), keepdims=True, ddof=0)
            rescaled = scaled * (std_c / std_s)
            scaled = rescaled * rescaled_phi + scaled * (1.0 - rescaled_phi)

        x_start = np.clip(scaled, -1.0, 1.0)
        pred_noise = (sr[time] * img - x_start) / srm1[time]

        if time_next < 0:
            img = x_start
            continue
        alpha_next = ac[time_next]
        img = x_start * np.sqrt(alpha_next) + np.sqrt(1 - alpha_next) * pred_noise
    return (img + 1.0) * 0.5


def test_cfg_f32_tracks_f64_oracle_at_sampler_level(setup):
    model, variables, emb = setup
    cfg = DiffusionConfig(image_size=IMG, channels=NC, timesteps=50,
                          sampling_timesteps=STEPS, objective="pred_x0")
    diffusion = GaussianDiffusion(model.apply, cfg)
    key = jax.random.PRNGKey(7)
    ours = np.asarray(diffusion.ddim_sample(
        variables, key, emb, cond_scale=2.0, rescaled_phi=0.7,
    ), np.float64)
    oracle = _f64_oracle_ddim(model, variables, emb, key,
                              cond_scale=2.0, rescaled_phi=0.7,
                              timesteps=50, sampling_timesteps=STEPS)
    # accumulated f32-vs-f64 drift over the whole 10-step chain
    assert np.max(np.abs(ours - oracle)) < 1e-3


def test_bf16_sampling_tracks_f32(setup):
    """--train_amp contract: bf16 activations stay close to the f32 pipeline
    on a fixed seed (PSNR bound on [0,1] images)."""
    model_f32, variables, emb = setup
    model_bf16 = _build(dtype=jnp.bfloat16)
    cfg = DiffusionConfig(image_size=IMG, channels=NC, timesteps=50,
                          sampling_timesteps=STEPS, objective="pred_x0")
    d32 = GaussianDiffusion(model_f32.apply, cfg)
    d16 = GaussianDiffusion(model_bf16.apply, cfg)
    key = jax.random.PRNGKey(11)
    x32 = np.asarray(d32.ddim_sample(variables, key, emb, cond_scale=1.5))
    x16 = np.asarray(d16.ddim_sample(variables, key, emb, cond_scale=1.5))
    assert x16.dtype == np.float32  # schedule algebra stays f32
    mse = float(np.mean((x32 - x16) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 25.0, f"bf16 sampling diverged: PSNR {psnr:.1f} dB"
