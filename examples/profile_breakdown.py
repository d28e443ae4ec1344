"""Scripted per-stage profile of the sampler hot path (PROFILE.md source).

Through the axon relay a full XProf device trace is not always available,
so this measures the op-level breakdown by construction instead: isolate
the UNet forward, the attention ops inside it, the DDIM epilogue, and
compare against XLA cost-analysis FLOPs to get MFU.

Usage: python examples/profile_breakdown.py [64|128|both]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    return float(jnp.mean(x))


def best_ms(fn, *args, reps=10, rounds=4):
    fence(fn(*args))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best


def profile_config(img, dim, mults, batch, steps=250, cond_scale=1.5):
    from ccdm_tpu.diffusion import DiffusionConfig, GaussianDiffusion
    from ccdm_tpu.embedding import make_fn_y2h
    from ccdm_tpu.models import Unet

    nc = 3
    model = Unet(dim=dim, dim_mults=mults, in_channels=nc, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, img, img, nc)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 128)), None, train=False,
    )
    emb = make_fn_y2h(128)(jnp.linspace(0.1, 0.9, batch))
    dcfg = DiffusionConfig(image_size=img, channels=nc, timesteps=1000,
                           sampling_timesteps=steps, objective="pred_x0")
    diffusion = GaussianDiffusion(model.apply, dcfg)

    b2 = 2 * batch  # the sampler runs cond+null as one 2B forward
    x2 = jax.random.normal(jax.random.PRNGKey(1), (b2, img, img, nc))
    t2 = jnp.full((b2,), 500, jnp.int32)
    e2 = jnp.concatenate([emb, emb])
    keep2 = jnp.concatenate([jnp.ones((batch,), bool), jnp.zeros((batch,), bool)])

    fwd = jax.jit(lambda v, x: model.apply(v, x, t2, e2, keep2, train=False))
    t_fwd = best_ms(fwd, variables, x2)

    # XLA cost analysis -> MFU
    comp = fwd.lower(variables, x2).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    mfu = flops / (t_fwd * 1e-3) / 197e12  # v5e bf16 peak
    hbm = float(ca.get("bytes accessed", 0.0))
    bw = hbm / (t_fwd * 1e-3) / 819e9  # v5e HBM BW fraction

    # full DDIM call amortized per step
    sample = jax.jit(lambda v, k, e: diffusion.ddim_sample(v, k, e, cond_scale=cond_scale))
    fence(sample(variables, jax.random.PRNGKey(2), emb))
    t0 = time.perf_counter()
    out = sample(variables, jax.random.PRNGKey(3), emb)
    fence(out)
    t_total = (time.perf_counter() - t0) * 1e3
    t_step = t_total / steps

    print(f"\n== {img}x{img} dim{dim} mults{mults} B{batch} (2B fwd = {b2}) ==")
    print(f"  UNet fwd          : {t_fwd:8.2f} ms   ({flops/1e9:.1f} GFLOP, "
          f"MFU {mfu*100:.1f}%, HBM {hbm/1e6:.0f} MB -> {bw*100:.0f}% of BW)")
    print(f"  DDIM step (meas.) : {t_step:8.2f} ms   (epilogue = step - fwd = {t_step - t_fwd:.2f} ms)")
    print(f"  sampler total     : {t_total/1e3:8.2f} s for {steps} steps -> "
          f"{batch / (t_total/1e3):.2f} img/s")
    return dict(img=img, t_fwd=t_fwd, t_step=t_step, mfu=mfu, flops=flops, hbm=hbm)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print(f"platform={jax.default_backend()}")
    if which in ("64", "both"):
        profile_config(64, 64, (1, 2, 2, 4, 8), 64)
    if which in ("128", "both"):
        profile_config(128, 64, (1, 2, 4, 4, 8, 8), 16, cond_scale=2.0)


if __name__ == "__main__":
    main()
