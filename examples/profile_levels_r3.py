"""Per-level breakdown of the 128^2 north-star UNet forward (PROFILE.md §8).

The §7 roofline shows the B=64 config at MFU 43.3% / 47% of HBM BW — neither
resource saturated, so the residual gap to speed-of-light lives in per-stage
efficiency. This times every module of the mults-(1,2,4,4,8,8) UNet
STANDALONE at its exact in-graph shape (2B=128 sampler batch) and reports
each stage's ms, FLOPs, MFU and share, so the next optimization target is a
measurement, not a guess.

Usage (real chip, idle):
    PYTHONPATH=/root/repo:$PYTHONPATH python examples/profile_levels_r3.py
"""

import time

import jax
import jax.numpy as jnp

from ccdm_tpu.models.layers import (
    Attention,
    Downsample,
    FusedLinearAttentionBlock,
    FusedResnetBlock,
    PreNormResidual,
    Upsample,
)
from flax import linen as nn

PEAK = 197e12
BW = 819e9


def fence(x):
    return float(jnp.mean(x))


def best_ms(fn, *args, reps=5, rounds=3):
    fence(fn(*args))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best


def cost(fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def stage(name, module, *args, method=None):
    fn = jax.jit(lambda v, *a: module.apply(v, *a, **(method or {})))
    key = jax.random.PRNGKey(0)
    variables = module.init(key, *args, **(method or {}))
    ms = best_ms(fn, variables, *args)
    fl, hbm = cost(lambda v, *a: module.apply(v, *a, **(method or {})), variables, *args)
    return dict(name=name, ms=ms, gflop=fl / 1e9,
                mfu=fl / (ms * 1e-3) / PEAK, bw=hbm / (ms * 1e-3) / BW,
                hbm_mb=hbm / 1e6)


def main():
    print(f"platform={jax.default_backend()}")
    b2 = 128  # 2B at the B=64 sampler optimum
    dt = jnp.bfloat16
    k = jax.random.PRNGKey(1)
    t_emb = jax.random.normal(k, (b2, 256), dt)
    c_emb = jax.random.normal(k, (b2, 256), dt)

    # mults (1,2,4,4,8,8): dims = [64,64,128,256,256,512,512]
    in_out = [(64, 64), (64, 128), (128, 256), (256, 256), (256, 512), (512, 512)]
    res = [128, 64, 32, 16, 8, 4]

    rows = []

    def x_at(hw, c):
        return jax.random.normal(k, (b2, hw, hw, c), dt)

    # init conv 7x7 3->64 @128^2
    class InitConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(64, (7, 7), padding=3, name="init_conv", dtype=dt)(x)

    rows.append(stage("init_conv 7x7 3->64 @128", InitConv(), x_at(128, 3)))

    for ind, (dim_in, dim_out) in enumerate(in_out):
        hw = res[ind]
        rows.append(stage(f"down{ind} resblock x1 C{dim_in} @{hw}",
                          FusedResnetBlock(dim_in, dtype=dt),
                          x_at(hw, dim_in), t_emb, c_emb))
        rows[-1]["mult"] = 2  # block1 + block2
        rows.append(stage(f"down{ind} attn C{dim_in} @{hw}",
                          FusedLinearAttentionBlock(dim_in, 4, 32, dtype=dt),
                          x_at(hw, dim_in)))
        if ind < len(in_out) - 1:
            rows.append(stage(f"down{ind} downsample {dim_in}->{dim_out} @{hw}",
                              Downsample(dim_out, dtype=dt), x_at(hw, dim_in)))
        else:
            class LastConv(nn.Module):
                @nn.compact
                def __call__(self, x):
                    return nn.Conv(dim_out, (3, 3), padding=1, dtype=dt)(x)
            rows.append(stage(f"down{ind} conv {dim_in}->{dim_out} @{hw}",
                              LastConv(), x_at(hw, dim_in)))

    mid = 512
    rows.append(stage("mid resblock x1 C512 @4", FusedResnetBlock(mid, dtype=dt),
                      x_at(4, mid), t_emb, c_emb))
    rows[-1]["mult"] = 2
    rows.append(stage("mid full-attn C512 @4",
                      PreNormResidual(mid, Attention(mid, 4, 32, dtype=dt)),
                      x_at(4, mid)))

    for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
        hw = res[len(res) - 1 - ind]
        # up blocks read concat(x, skip): C_in = dim_out + dim_in
        rows.append(stage(f"up{ind} resblock x1 C{dim_out}+{dim_in} @{hw}",
                          FusedResnetBlock(dim_out, dtype=dt),
                          x_at(hw, dim_out + dim_in), t_emb, c_emb))
        rows[-1]["mult"] = 2
        rows.append(stage(f"up{ind} attn C{dim_out} @{hw}",
                          FusedLinearAttentionBlock(dim_out, 4, 32, dtype=dt),
                          x_at(hw, dim_out)))
        if ind < len(in_out) - 1:
            rows.append(stage(f"up{ind} upsample {dim_out}->{dim_in} @{hw}",
                              Upsample(dim_in, dtype=dt), x_at(hw, dim_out)))

    # final res block over concat(x, r): C_in = 128
    rows.append(stage("final resblock C64+64 @128", FusedResnetBlock(64, dtype=dt),
                      x_at(128, 128), t_emb, c_emb))

    class FinalConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(3, (1, 1), dtype=jnp.float32)(x)

    rows.append(stage("final conv 1x1 64->3 @128", FinalConv(), x_at(128, 64)))

    total = sum(r["ms"] * r.get("mult", 1) for r in rows)
    print(f"\n{'stage':<38}{'ms':>8}{'xN':>4}{'GFLOP':>9}{'MFU%':>7}"
          f"{'BW%':>6}{'share%':>8}")
    for r in rows:
        m = r.get("mult", 1)
        print(f"{r['name']:<38}{r['ms']:>8.2f}{m:>4}{r['gflop']:>9.1f}"
              f"{r['mfu'] * 100:>7.1f}{r['bw'] * 100:>6.0f}"
              f"{r['ms'] * m / total * 100:>8.1f}")
    print(f"\nsum of stages: {total:.2f} ms (in-graph fwd measured 81.4 ms; "
          "the delta is XLA cross-stage fusion + this harness's per-stage "
          "launch overheads)")


if __name__ == "__main__":
    main()
