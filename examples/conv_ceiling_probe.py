"""What does XLA's bare conv3x3 achieve at the 128^2-L0 shapes? (PROFILE §8)

Separates two explanations for the measured ~27% resnet-block MFU at L0:
(a) XLA's conv ceiling at C=64 output lanes, vs (b) fusion overhead added by
the norm/FiLM/SiLU chain. Also probes the lane-fill theory: if Cout=128
roughly doubles MFU over Cout=64 at the same FLOPs/byte mix, the output
channel count is the binding constraint.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python examples/conv_ceiling_probe.py
"""

import time

import jax
import jax.numpy as jnp

PEAK = 197e12
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


def probe(h, cin, cout, kk=3, batch=B2):
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, h, h, cin),
                          jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (kk, kk, cin, cout),
                           jnp.float32) * 0.05).astype(jnp.bfloat16)

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((kk // 2, kk // 2),) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ms = best_ms(jax.jit(conv), x)
    gflop = 2 * batch * h * h * kk * kk * cin * cout / 1e9
    mfu = gflop / ms / 1e-3 / 1e9 / PEAK * 1e12  # gflop/(ms*1e-3)/1e9 -> GF/s
    mfu = gflop * 1e9 / (ms * 1e-3) / PEAK
    print(f"  conv{kk}x{kk} {cin:>4}->{cout:<4} @{h:>3}^2 B{batch}: "
          f"{ms:7.2f} ms  {gflop:8.1f} GF  MFU {mfu * 100:5.1f}%")
    return ms


def main():
    print(f"platform={jax.default_backend()}")
    # L0 shapes (the north-star's hot convs)
    probe(128, 64, 64)
    probe(128, 128, 64)   # up-block conv1 (concat input)
    # lane-fill probe: same input, wider output
    probe(128, 64, 128)
    probe(128, 64, 256)
    # deeper-level references
    probe(64, 64, 64)
    probe(64, 128, 128)
    probe(32, 256, 256)
    # batch scaling at the L0 shape
    probe(128, 64, 64, batch=64)


if __name__ == "__main__":
    main()
