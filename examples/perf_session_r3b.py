"""Round-3b perf session: 128^2 north-star refinement.

1. Fresh roofline position at the CURRENT optimum (B=64): fwd ms, MFU,
   HBM-bytes fraction from XLA cost analysis — is the config now MXU-bound
   (conv efficiency at C=64) or still traffic-bound?
2. Finer batch sweep between the measured B=64 optimum and the B=96 VMEM
   cliff (PROFILE.md §7): B in {72, 80}.

Run on the real chip, nothing else using it:
    python examples/perf_session_r3b.py [sweep|roofline|both]
"""

import sys
import time

import jax
import jax.numpy as jnp


def fence(x):
    return float(jnp.mean(x))


def build(img, dim, mults, batch, steps, cond_scale):
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
    return model, variables, diffusion, emb


def sample_rate(img, batch, steps=250, dim=64, mults=(1, 2, 4, 4, 8, 8),
                cond_scale=2.0, reps=3):
    _, variables, diffusion, emb = build(img, dim, mults, batch, steps, cond_scale)
    sample = jax.jit(lambda v, k, e: diffusion.ddim_sample(v, k, e,
                                                           cond_scale=cond_scale))
    fence(sample(variables, jax.random.PRNGKey(1), emb))
    best = 0.0
    for r in range(reps):
        t0 = time.perf_counter()
        out = sample(variables, jax.random.PRNGKey(2 + r), emb)
        fence(out)
        best = max(best, batch / (time.perf_counter() - t0))
    return best


def roofline(img=128, batch=64, dim=64, mults=(1, 2, 4, 4, 8, 8),
             cond_scale=2.0):
    model, variables, diffusion, emb = build(img, dim, mults, batch, 250,
                                             cond_scale)
    b2 = 2 * batch
    x2 = jax.random.normal(jax.random.PRNGKey(1), (b2, img, img, 3))
    t2 = jnp.full((b2,), 500, jnp.int32)
    e2 = jnp.concatenate([emb, emb])
    fwd = jax.jit(lambda v, x: model.apply(v, x, t2, e2, None, train=False))
    fence(fwd(variables, x2))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fwd(variables, x2)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / 5 * 1e3)
    comp = fwd.lower(variables, x2).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    hbm = float(ca.get("bytes accessed", 0.0))
    mfu = flops / (best * 1e-3) / 197e12
    bw = hbm / (best * 1e-3) / 819e9
    print(f"== roofline {img}^2 B{batch} (2B={b2}) ==")
    print(f"  fwd {best:.2f} ms | {flops/1e9:.0f} GFLOP MFU {mfu*100:.1f}% | "
          f"HBM {hbm/1e6:.0f} MB -> {bw*100:.0f}% of BW")
    # speed-of-light given these bytes/flops
    t_bw = hbm / 819e9 * 1e3
    t_mxu = flops / 197e12 * 1e3
    print(f"  lower bounds: BW {t_bw:.2f} ms, MXU {t_mxu:.2f} ms -> "
          f"SoL {max(t_bw, t_mxu):.2f} ms ({best / max(t_bw, t_mxu):.2f}x off)")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print(f"platform={jax.default_backend()}")
    if which in ("roofline", "both"):
        roofline()
    if which in ("sweep", "both"):
        for b in (72, 80):
            r = sample_rate(128, b)
            print(f"  128^2 B={b}: {r:.3f} img/s/chip")


if __name__ == "__main__":
    main()
