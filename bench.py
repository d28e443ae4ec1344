"""Benchmark: images/sec/chip for 64x64 DDIM-250 conditional sampling.

This is the BASELINE.json headline metric — the reference measures the same
quantity per label via `sample_time_i` (CCDM_unified/main.py:525-552). The
workload is the RC-49 64^2 CCDM sampler: dim-64 UNet with dim_mults 1_2_2_4_8,
DDIM 250 steps, classifier-free guidance cond_scale 1.5 (two logical passes,
batched to one 2B forward per step), EMA-style weights resident in HBM.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against BENCH_BASELINE.json (written on first run), so
cross-round progress is visible even though the reference repo publishes no
numeric throughput (SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ccdm_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()

    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from ccdm_tpu.embedding import make_fn_y2h
    from ccdm_tpu.models import Unet

    IMG, NC, BATCH, STEPS = 64, 3, 64, 250
    platform = jax.devices()[0].platform
    if platform == "cpu":  # keep CI/dev runs tractable
        IMG, BATCH, STEPS, DIM, MULTS = 16, 8, 10, 16, (1, 2)
    else:
        DIM, MULTS = 64, (1, 2, 2, 4, 8)

    model = Unet(dim=DIM, dim_mults=MULTS, in_channels=NC, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, jnp.zeros((2, IMG, IMG, NC)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 128)), None, train=False,
    )
    dcfg = DiffusionConfig(image_size=IMG, channels=NC, timesteps=1000,
                           sampling_timesteps=STEPS, objective="pred_x0")
    diffusion = GaussianDiffusion(model.apply, dcfg)
    fn_y2h = make_fn_y2h(128)

    labels = jnp.linspace(0.1, 0.9, BATCH)
    emb = fn_y2h(labels)

    sample = jax.jit(lambda v, k, e: diffusion.ddim_sample(v, k, e, cond_scale=1.5))

    # compile + warmup
    out = sample(variables, jax.random.PRNGKey(1), emb)
    out.block_until_ready()

    n_rep = 3 if platform != "cpu" else 1
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = sample(variables, jax.random.PRNGKey(2 + i), emb)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep

    n_chips = max(jax.device_count(), 1)
    imgs_per_sec_per_chip = BATCH / dt / n_chips

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = imgs_per_sec_per_chip
        with open(base_path, "w") as f:
            json.dump({"value": baseline, "platform": platform,
                       "config": f"img{IMG} b{BATCH} s{STEPS}"}, f)

    print(json.dumps({
        "metric": "images_per_sec_per_chip_ddim250_64px",
        "value": round(imgs_per_sec_per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / baseline, 3),
    }))


if __name__ == "__main__":
    main()
