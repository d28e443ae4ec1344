"""DiffAugment — differentiable GAN augmentation (pure jax).

TPU-native re-design of `CCDM_unified/DiffAugment_pytorch.py:9-76`:
- color: brightness (+U[-0.5,0.5]), saturation (mean-centered * U[0,2]),
  contrast (per-image-mean-centered * U[0.5,1.5])
- translation: shift by U[-w/8, w/8] pixels with zero padding
- cutout: zero a half-size square at a random center

All ops are differentiable w.r.t. x (masks/gathers treat indices as
constants) and fixed-shape. NHWC in [-1,1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rand_brightness(key: jax.Array, x: jax.Array) -> jax.Array:
    b = jax.random.uniform(key, (x.shape[0], 1, 1, 1)) - 0.5
    return x + b


def rand_saturation(key: jax.Array, x: jax.Array) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    s = jax.random.uniform(key, (x.shape[0], 1, 1, 1)) * 2.0
    return (x - mean) * s + mean


def rand_contrast(key: jax.Array, x: jax.Array) -> jax.Array:
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    c = jax.random.uniform(key, (x.shape[0], 1, 1, 1)) + 0.5
    return (x - mean) * c + mean


def rand_translation(key: jax.Array, x: jax.Array, ratio: float = 0.125) -> jax.Array:
    b, h, w, c = x.shape
    kx, ky = jax.random.split(key)
    sh = int(h * ratio + 0.5)
    sw = int(w * ratio + 0.5)
    tx = jax.random.randint(kx, (b,), -sh, sh + 1)
    ty = jax.random.randint(ky, (b,), -sw, sw + 1)
    padded = jnp.pad(x, ((0, 0), (sh, sh), (sw, sw), (0, 0)))
    rows = jnp.arange(h)[None, :] + sh + tx[:, None]  # [B, H]
    cols = jnp.arange(w)[None, :] + sw + ty[:, None]  # [B, W]
    out = jax.vmap(lambda img, r, cc: img[r][:, cc])(padded, rows, cols)
    return out


def rand_cutout(key: jax.Array, x: jax.Array, ratio: float = 0.5) -> jax.Array:
    b, h, w, c = x.shape
    kx, ky = jax.random.split(key)
    ch = int(h * ratio + 0.5)
    cw = int(w * ratio + 0.5)
    cy = jax.random.randint(kx, (b, 1, 1), 0, h + (1 - ch % 2))
    cx = jax.random.randint(ky, (b, 1, 1), 0, w + (1 - cw % 2))
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    mask_y = jnp.abs(ys - cy) >= ch // 2
    mask_x = jnp.abs(xs - cx) >= cw // 2
    mask = (mask_y | mask_x).astype(x.dtype)[..., None]
    return x * mask


_POLICIES = {
    "color": lambda k, x: rand_contrast(jax.random.fold_in(k, 2),
                         rand_saturation(jax.random.fold_in(k, 1),
                         rand_brightness(jax.random.fold_in(k, 0), x))),
    "translation": rand_translation,
    "cutout": rand_cutout,
}


def diff_augment(key: jax.Array, x: jax.Array, policy: str = "color,translation,cutout") -> jax.Array:
    """Apply the comma-separated augmentation policy (reference default
    'color,translation,cutout', DiffAugment_pytorch.py:9-28)."""
    if not policy:
        return x
    for i, name in enumerate(p.strip() for p in policy.split(",")):
        if not name:
            continue
        x = _POLICIES[name](jax.random.fold_in(key, i + 101), x)
    return x
