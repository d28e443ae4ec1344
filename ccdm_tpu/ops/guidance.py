"""Classifier-free guidance combination ops.

TPU-native re-design of `CCDM_unified/models/unet.py:51-62` (parallel
component removal, done in f64 in the reference) and `:350-380`
(forward_with_cond_scale guidance algebra, incl. rescaled-phi).

These are pure array functions applied to the (cond, null) model outputs;
the two UNet passes themselves are batched into a single 2B forward by the
sampler (see ccdm_tpu.diffusion.sampling), so guidance here is the only
per-step epilogue. f32 throughout: the reference's f64 `project` exists for
numerical safety of the normalization, which we get in f32 with an explicit
eps (tests/test_fidelity.py bounds the full-DDIM-chain drift vs an f64
oracle to <1e-3 max-abs; tests/test_ops.py checks the op itself).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def project_parallel(x: jax.Array, y: jax.Array):
    """Decompose x into components parallel/orthogonal to y (per batch row).

    Flattens all non-batch dims, mirrors `models/unet.py:51-62`.
    Returns (parallel, orthogonal), both reshaped to x.shape.
    """
    b = x.shape[0]
    xf = x.reshape(b, -1).astype(jnp.float32)
    yf = y.reshape(b, -1).astype(jnp.float32)
    unit = yf * jax.lax.rsqrt(jnp.sum(yf * yf, axis=-1, keepdims=True) + 1e-12)
    parallel = jnp.sum(xf * unit, axis=-1, keepdims=True) * unit
    orthogonal = xf - parallel
    return parallel.reshape(x.shape).astype(x.dtype), orthogonal.reshape(x.shape).astype(x.dtype)


def apply_cfg(
    logits: jax.Array,
    null_logits: jax.Array,
    cond_scale: float,
    rescaled_phi: float = 0.0,
    remove_parallel_component: bool = True,
    keep_parallel_frac: float = 0.0,
):
    """Combine conditional/unconditional outputs into guided output.

    update = logits - null_logits, optionally with the component parallel to
    logits removed; guided = logits + (cond_scale-1) * update; optional
    rescaled-phi std matching. Semantics of `models/unet.py:350-380`.

    Returns (guided_logits, null_logits) like the reference's
    forward_with_cond_scale.

    cond_scale may be a python float (static; unit scale short-circuits) or a
    traced jnp scalar (serving passes it as a runtime argument so one
    compiled sampler covers every requested scale).
    """
    if isinstance(cond_scale, (int, float)) and float(cond_scale) == 1.0:
        return logits, null_logits
    update = logits - null_logits
    if remove_parallel_component:
        parallel, orthog = project_parallel(update, logits)
        update = orthog + parallel * keep_parallel_frac
    scaled = logits + update * (cond_scale - 1.0)
    if rescaled_phi == 0.0:
        return scaled, null_logits
    axes = tuple(range(1, scaled.ndim))
    std_cond = jnp.std(logits, axis=axes, keepdims=True)
    std_scaled = jnp.std(scaled, axis=axes, keepdims=True)
    rescaled = scaled * (std_cond / (std_scaled + 1e-12))
    out = rescaled * rescaled_phi + scaled * (1.0 - rescaled_phi)
    return out, null_logits
