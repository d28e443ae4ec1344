"""Where does the 128^2-L0 fused attention block's time go? (PROFILE.md §8)

The per-level profile shows the large-N fused block at the north-star L0
shape (2B=128, N=16384, C=64, F=128) runs ~4x off its matmul lower bound.
This times, on the real chip:
  1. the XLA unfused composition (attn_block_reference)
  2. the fused two-pass forward at chunk 2048 / 4096 / 8192
  3. pass A alone, pass B alone, the kmax precompute alone (attribution)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python examples/attn_l0_experiments.py
"""

import functools
import time

import jax
import jax.numpy as jnp

from ccdm_tpu.ops import attn_block as ab

B, N, C, HEADS, DH = 128, 16384, 64, 4, 32
F = HEADS * DH


def fence(x):
    if isinstance(x, tuple):
        x = x[0]
    return float(jnp.mean(x))


def best_ms(fn, *args, reps=5, rounds=4):
    fence(fn(*args))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (B, N, C), jnp.bfloat16)
    g_pre = jax.random.normal(ks[1], (C,), jnp.float32) * 0.1 + 1.0
    wqkv = jax.random.normal(ks[2], (C, 3 * F), jnp.float32) * 0.05
    wout = jax.random.normal(ks[3], (F, C), jnp.float32) * 0.05
    bout = jnp.zeros((C,), jnp.float32)
    g_out = jnp.ones((C,), jnp.float32)

    print(f"platform={jax.default_backend()}  shape B{B} N{N} C{C} F{F}")

    ref = jax.jit(functools.partial(ab.attn_block_reference, heads=HEADS,
                                    dim_head=DH))
    t = best_ms(ref, x, g_pre, wqkv, wout, bout, g_out)
    print(f"XLA unfused composition : {t:7.2f} ms")

    for chunk in (2048, 4096):
        fused = jax.jit(functools.partial(
            ab._forward_pallas_large, heads=HEADS, dim_head=DH, chunk=chunk))
        t = best_ms(fused, x, g_pre, wqkv, wout, bout, g_out)
        print(f"fused two-pass chunk={chunk:<5}: {t:7.2f} ms")

    # ---- attribution: kmax precompute alone (XLA matmul+reduce over x)
    def kmax_only(x):
        xn32 = x.astype(jnp.float32)
        xn32 = xn32 * jax.lax.rsqrt(
            jnp.mean(xn32 * xn32, axis=-1, keepdims=True) + 1e-12)
        xn32 = xn32 * g_pre.astype(jnp.float32)
        k_full = jax.lax.dot_general(
            xn32.astype(jnp.bfloat16), wqkv[:, F:2 * F].astype(jnp.bfloat16),
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return jnp.max(k_full, axis=1, keepdims=True)

    t_kmax = best_ms(jax.jit(kmax_only), x)
    print(f"kmax precompute alone   : {t_kmax:7.2f} ms")

    # ---- pass A alone (pallas_call extracted with the same specs)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def passA(x2d, kmax, chunk):
        b, n, c = x2d.shape
        nc = n // chunk
        dt = x2d.dtype
        row = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                         memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
        a_spec = pl.BlockSpec((1, F, F), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, 1, F), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        wkv = wqkv[:, F:].astype(dt)
        return pl.pallas_call(
            functools.partial(ab._kernel_ctx_large, f=F),
            out_shape=(jax.ShapeDtypeStruct((b, F, F), jnp.float32),
                       jax.ShapeDtypeStruct((b, 1, F), jnp.float32)),
            grid=(b, nc),
            in_specs=[xspec, row((c,)), row((c, 2 * F)), s_spec],
            out_specs=(a_spec, s_spec),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * (c * 2 * F + F * F),
                bytes_accessed=b * n * c * dt.itemsize,
                transcendentals=b * n * F,
            ),
        )(x2d, g_pre, wkv, kmax)

    kmax = jax.jit(kmax_only)(x)
    for chunk in (2048, 4096, 8192):
        t = best_ms(jax.jit(functools.partial(passA, chunk=chunk)), x, kmax)
        print(f"pass A alone chunk={chunk:<5}: {t:7.2f} ms")


if __name__ == "__main__":
    main()
