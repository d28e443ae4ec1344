"""A/B the folded upsample-conv vs the reference composition at the four
Upsample shapes of the UTKFace-128 UNet (2B=128 sampler batch).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_upsample_fold.py
"""

import time

import jax
import jax.numpy as jnp

from ccdm_tpu.ops.upsample_fold import (
    upsample_conv3x3_folded,
    upsample_conv3x3_reference,
)

# (h, cin, cout) per Upsample call in the mults-(1,2,4,4,8,8) up path
SHAPES = [(4, 512, 512), (8, 512, 256), (16, 256, 256), (32, 256, 128),
          (64, 128, 64)]
B2 = 128


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


def main():
    print(f"platform={jax.default_backend()}  2B={B2}")
    print(f"{'shape':<22}{'reference':>11}{'conv3':>9}{'conv2x3':>9}")
    tot = dict(reference=0.0, conv3=0.0, conv2x3=0.0)
    for h, cin, cout in SHAPES:
        key = jax.random.PRNGKey(h)
        x = jax.random.normal(key, (B2, h, h, cin), jnp.bfloat16)
        kernel = jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.05
        bias = jnp.zeros((cout,), jnp.float32)
        t_ref = best_ms(jax.jit(
            lambda x: upsample_conv3x3_reference(x, kernel, bias)), x)
        t_c3 = best_ms(jax.jit(
            lambda x: upsample_conv3x3_folded(x, kernel, bias, "conv3")), x)
        t_c23 = best_ms(jax.jit(
            lambda x: upsample_conv3x3_folded(x, kernel, bias, "conv2x3")), x)
        tot["reference"] += t_ref
        tot["conv3"] += t_c3
        tot["conv2x3"] += t_c23
        print(f"{h:>3}^2 {cin:>4}->{cout:<4}      "
              f"{t_ref:>11.3f}{t_c3:>9.3f}{t_c23:>9.3f}")
    print(f"{'TOTAL':<22}{tot['reference']:>11.3f}{tot['conv3']:>9.3f}"
          f"{tot['conv2x3']:>9.3f}")


if __name__ == "__main__":
    main()
