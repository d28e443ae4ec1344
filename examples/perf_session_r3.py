"""Round-3 TPU perf session: fused-backward A/B + 128^2 batch sweep.

Measures (real chip, scalar-transfer fenced, min-of-rounds):
1. RC-49 64^2 train-step throughput with the fused attention-block backward
   ON vs OFF (CCDM_TPU_FUSED_ATTN_BWD) — the round-3 kernel.
2. UTKFace-128 sampler throughput at batch {48, 64, 96} with the current
   default path (incl. the exact-kmax shift) — re-locate the optimum.

Usage: python examples/perf_session_r3.py [train|sweep|all]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    return float(jnp.mean(x if not hasattr(x, "params") else x.step))


def bench_train(fused_bwd: bool, n_steps: int = 20):
    os.environ["CCDM_TPU_FUSED_ATTN_BWD"] = "1" if fused_bwd else "0"
    # re-import not needed: the env is read at call time inside _can_fuse_bwd
    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from ccdm_tpu.embedding import make_fn_y2h
    from ccdm_tpu.models import Unet
    from ccdm_tpu.training import Trainer, TrainerConfig

    img, nc, batch, dim, mults = 64, 3, 128, 64, (1, 2, 2, 4, 8)
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
                         results_folder=f"/tmp/ccdm_r3_train_{fused_bwd}",
                         sample_every=10**9, save_every=10**9)
    trainer = Trainer(diffusion, variables, images, labels, tcfg)
    step_fn = trainer._build_train_step(make_fn_y2h(128))
    state = trainer.state
    state, loss = step_fn(state, jax.random.PRNGKey(1))
    l0 = float(loss)
    assert np.isfinite(l0), f"non-finite loss {l0} (fused_bwd={fused_bwd})"
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = step_fn(state, jax.random.PRNGKey(2 + i))
    float(loss)
    dt = (time.perf_counter() - t0) / n_steps
    return batch / dt, l0


def bench_sampler(img, mults, batch, cond_scale, steps=250, n_rep=1):
    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from ccdm_tpu.embedding import make_fn_y2h
    from ccdm_tpu.models import Unet

    nc = 3
    model = Unet(dim=64, dim_mults=mults, in_channels=nc, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, img, img, nc)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 128)), None, train=False)
    dcfg = DiffusionConfig(image_size=img, channels=nc, timesteps=1000,
                           sampling_timesteps=steps, objective="pred_x0")
    diffusion = GaussianDiffusion(model.apply, dcfg)
    emb = make_fn_y2h(128)(jnp.linspace(0.1, 0.9, batch))
    sample = jax.jit(lambda v, k, e: diffusion.ddim_sample(v, k, e,
                                                           cond_scale=cond_scale))
    float(jnp.mean(sample(variables, jax.random.PRNGKey(1), emb)))
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = sample(variables, jax.random.PRNGKey(2 + i), emb)
    float(jnp.mean(out))
    dt = (time.perf_counter() - t0) / n_rep
    return batch / dt


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    from ccdm_tpu.utils.compilation_cache import enable

    enable()
    out = {}
    if what in ("train", "all"):
        ips_off, loss_off = bench_train(False)
        out["train_img_s_xla_bwd"] = round(ips_off, 1)
        ips_on, loss_on = bench_train(True)
        out["train_img_s_fused_bwd"] = round(ips_on, 1)
        out["train_loss_first_step"] = {"xla": round(loss_off, 4),
                                        "fused": round(loss_on, 4)}
        out["fused_bwd_speedup"] = round(ips_on / ips_off, 3)
    if what in ("sweep", "all"):
        for b in (48, 64, 96):
            out[f"uk128_b{b}_img_s"] = round(
                bench_sampler(128, (1, 2, 4, 4, 8, 8), b, 2.0), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
