"""A/B microbenchmark: linear-attention kernels vs XLA at large N.

The north-star workload (UTKFace 128^2 DDIM-250) runs its top UNet level at
N=16384 tokens, F=128 lanes — beyond the full-lane kernel's VMEM cell cap.
This script times, on the real TPU:

  xla        linear_attention_reference (softmaxes + 2 einsums, unfused)
  twopass    _forward_pallas_twopass (round-2: XLA colmax -> Pallas ctx
             accumulation -> Pallas out pass; each array read once)

at the shapes the 128^2 / 192^2 samplers actually hit. Prints a markdown
table (committed to PROFILE.md).

Usage: python examples/bench_linear_attention.py [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp

from ccdm_tpu.ops import linear_attention as la


def fence(x):
    return float(jnp.mean(x))


def timeit(fn, *args, reps=20):
    out = fn(*args)  # compile
    fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    shapes = [
        # (B, N, H, D)  — 128^2 L0 (sampler 2B batch), 128^2 L1, 192^2 L0
        (64, 16384, 4, 32),
        (32, 16384, 4, 32),
        (64, 4096, 4, 32),
        (16, 36864, 4, 32),
    ]
    print(f"| B | N | kernel | ms/op |  (platform={jax.default_backend()}, reps={reps})")
    print("|---|---|---|---|")
    for b, n, h, d in shapes:
        key = jax.random.PRNGKey(0)
        q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (b, n, h, d),
                                     jnp.bfloat16) for i in range(3))
        t_xla = timeit(jax.jit(la.linear_attention_reference), q, k, v, reps=reps)
        print(f"| {b} | {n} | xla | {t_xla:.2f} |")
        if n * h * d <= la._MAX_CELL_ELEMS:
            t_fl = timeit(jax.jit(la._forward_pallas_fulllane), q, k, v, reps=reps)
            print(f"| {b} | {n} | fulllane | {t_fl:.2f} |")
        t_tp = timeit(jax.jit(la._forward_pallas_twopass), q, k, v, reps=reps)
        print(f"| {b} | {n} | twopass | {t_tp:.2f} |")


if __name__ == "__main__":
    main()
