"""Round-4 perf session: extend the §8 speed-of-light method to the train
step, the 64² headline sampler, and the 192² flagship (VERDICT r3 'next'
#5 — PROFILE.md §9).

For each workload: roofline position from XLA cost analysis (FLOPs, HBM
bytes, MFU%, BW%) + a batch sweep around the benched operating point (the
cheapest lever; §8 showed the 128² optimum sat exactly at a VMEM cliff).
v5e peaks: 197 TFLOP/s bf16, 819 GB/s HBM.

Run on the real chip, nothing else using it:
    python examples/perf_session_r4.py [train|head64|uk192|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_FLOPS = 197e12
PEAK_BW = 819e9


def fence(x):
    return float(jnp.mean(jax.tree_util.tree_leaves(x)[0]))


def cost(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def report(tag: str, ms: float, flops: float, byts: float, imgs: float):
    mfu = flops / (ms / 1e3) / PEAK_FLOPS * 100
    bw = byts / (ms / 1e3) / PEAK_BW * 100
    lower = (flops / PEAK_FLOPS + 0 * byts) / 1  # compute bound alone
    bound_ms = max(flops / PEAK_FLOPS, byts / PEAK_BW) * 1e3
    print(f"[{tag}] {ms:.2f} ms  {flops/1e9:.1f} GFLOP  {byts/1e9:.2f} GB  "
          f"MFU {mfu:.1f}%  BW {bw:.1f}%  max-resource bound {bound_ms:.2f} ms "
          f"({ms/bound_ms:.2f}x)  -> {imgs/(ms/1e3):.1f} img/s", flush=True)


# ------------------------------------------------------------------ train


def train_step_setup(batch: int, img=64, nc=3, dim=64, mults=(1, 2, 2, 4, 8)):
    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from ccdm_tpu.embedding import make_fn_y2h
    from ccdm_tpu.models import Unet
    from ccdm_tpu.training import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    n = 512
    labels = rng.choice(np.linspace(0.1, 0.9, 64), size=n).astype(np.float32)
    images = np.clip(labels[:, None, None, None] * 255
                     + rng.normal(0, 20, (n, img, img, nc)), 0, 255).astype(np.uint8)
    model = Unet(dim=dim, dim_mults=mults, in_channels=nc, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, img, img, nc)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 128)), None, train=False)
    dcfg = DiffusionConfig(image_size=img, channels=nc, timesteps=1000,
                           objective="pred_x0", vicinity_type="hv")
    diffusion = GaussianDiffusion(model.apply, dcfg)
    tcfg = TrainerConfig(data_name="synthetic", train_batch_size=batch,
                         train_num_steps=1, vicinity_type="hv",
                         results_folder="/tmp/ccdm_bench_train",
                         sample_every=10**9, save_every=10**9)
    trainer = Trainer(diffusion, variables, images, labels, tcfg)
    step_fn = trainer._build_train_step(make_fn_y2h(128))
    return trainer, step_fn


def audit_train(batches=(64, 128, 256)):
    for b in batches:
        trainer, step_fn = train_step_setup(b)
        state = trainer.state
        lowered = step_fn.lower(state, jax.random.PRNGKey(1))
        compiled = lowered.compile()
        flops, byts = cost(compiled)
        state, loss = step_fn(state, jax.random.PRNGKey(1))
        fence(loss)
        n_steps = 20
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, loss = step_fn(state, jax.random.PRNGKey(2 + i))
        fence(loss)
        ms = (time.perf_counter() - t0) / n_steps * 1e3
        report(f"train b={b}", ms, flops, byts, b)


# ----------------------------------------------------------------- head64


def sampler_setup(img, batch, steps, dim, mults, cond_scale, nc=3):
    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from ccdm_tpu.embedding import make_fn_y2h
    from ccdm_tpu.models import Unet

    model = Unet(dim=dim, dim_mults=mults, in_channels=nc, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, img, img, nc)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 128)), None, train=False)
    emb = make_fn_y2h(128)(jnp.linspace(0.1, 0.9, batch))
    dcfg = DiffusionConfig(image_size=img, channels=nc, timesteps=1000,
                           sampling_timesteps=steps, objective="pred_x0")
    diffusion = GaussianDiffusion(model.apply, dcfg)
    sample = jax.jit(lambda v, k, e: diffusion.ddim_sample(v, k, e,
                                                           cond_scale=cond_scale))
    return variables, sample, emb


def _precast_bf16(variables):
    """r5 sampler lever — see ccdm_tpu.training.state.precast_sampling_params."""
    from ccdm_tpu.training.state import precast_sampling_params

    return precast_sampling_params(variables)


def audit_sampler(tag, img, batches, steps, dim, mults, cond_scale, reps=2):
    for b in batches:
        variables, sample, emb = sampler_setup(img, b, steps, dim, mults, cond_scale)
        for arm, v in (("f32-params", variables),
                       ("bf16-precast", _precast_bf16(variables))):
            lowered = sample.lower(v, jax.random.PRNGKey(1), emb)
            compiled = lowered.compile()
            flops, byts = cost(compiled)  # whole 250-step scan
            fence(sample(v, jax.random.PRNGKey(1), emb))
            best = float("inf")
            for r in range(reps):
                t0 = time.perf_counter()
                out = sample(v, jax.random.PRNGKey(2 + r), emb)
                fence(out)
                best = min(best, time.perf_counter() - t0)
            ms = best * 1e3
            report(f"{tag} b={b} {arm} ({steps} steps)", ms, flops, byts, b)
            print(f"    per-UNet-step: {ms/steps:.3f} ms "
                  f"(2B={2*b} forward)", flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    from ccdm_tpu.utils.compilation_cache import enable

    enable()
    print("devices:", jax.devices(), flush=True)
    if mode in ("train", "all"):
        audit_train()
    if mode in ("head64", "all"):
        audit_sampler("head64", 64, (48, 64, 96, 128), 250, 64,
                      (1, 2, 2, 4, 8), 1.5)
    if mode in ("uk192", "all"):
        audit_sampler("uk192", 192, (16, 24, 32), 250, 64,
                      (1, 2, 2, 4, 4, 8, 8), 2.0, reps=1)


if __name__ == "__main__":
    main()
    os._exit(0)
