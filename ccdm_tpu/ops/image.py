"""Image normalization helpers and device-side data augmentation.

Replaces the reference's host-side numpy augmentation + per-step H2D copy
(`CCDM_unified/utils.py:164-211`, `trainer.py:461-482`) with vectorized
on-device ops: flips are `lax.rev`, rot90 is transpose+rev — gather-free and
fused by XLA into the input pipeline of the train step.

Layout: NHWC uint8 in, NHWC float out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_images(images: jax.Array, to_neg_one_to_one: bool = False) -> jax.Array:
    """uint8 [0,255] -> float32 [0,1] (or [-1,1]).

    Semantics of `CCDM_unified/utils.py:182-186`.
    """
    out = images.astype(jnp.float32) / 255.0
    if to_neg_one_to_one:
        out = out * 2.0 - 1.0
    return out


def normalize_to_neg_one_to_one(x: jax.Array) -> jax.Array:
    return x * 2.0 - 1.0


def unnormalize_to_zero_to_one(x: jax.Array) -> jax.Array:
    return (x + 1.0) * 0.5


def to_uint8(x01: jax.Array) -> jax.Array:
    """Clip [0,1] floats and quantize to uint8 (trainer.py:853-854 semantics)."""
    return (jnp.clip(x01, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def random_hflip(key: jax.Array, images: jax.Array, p: float = 0.5) -> jax.Array:
    """Per-sample random horizontal flip (NHWC, flips W axis)."""
    flip = jax.random.bernoulli(key, p, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def random_vflip(key: jax.Array, images: jax.Array, p: float = 0.5) -> jax.Array:
    """Per-sample random vertical flip (NHWC, flips H axis)."""
    flip = jax.random.bernoulli(key, p, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, ::-1, :, :], images)


def random_rot90(key: jax.Array, images: jax.Array) -> jax.Array:
    """Per-sample random rotation by k*90 degrees, k ~ U{0,1,2,3} (NHWC, H==W).

    Semantics of `CCDM_unified/utils.py:198-211` (np.rot90 per sample); here
    all four rotations are computed as transpose/rev combinations and selected
    per sample — branch-free, static shapes.
    """
    k = jax.random.randint(key, (images.shape[0], 1, 1, 1), 0, 4)
    r0 = images
    r1 = jnp.flip(jnp.swapaxes(images, 1, 2), axis=1)   # rot90
    r2 = jnp.flip(jnp.flip(images, axis=1), axis=2)     # rot180
    r3 = jnp.flip(jnp.swapaxes(images, 1, 2), axis=2)   # rot270
    return jnp.where(k == 0, r0, jnp.where(k == 1, r1, jnp.where(k == 2, r2, r3)))


def augment_for_dataset(data_name: str, key: jax.Array, images: jax.Array) -> jax.Array:
    """Per-dataset augmentation policy (`CCDM_unified/trainer.py:468-473`):
    UTKFace -> hflip; Cell200 -> rot90 + hflip + vflip; others -> none.
    """
    if data_name == "UTKFace":
        return random_hflip(key, images)
    if data_name == "Cell200":
        k1, k2, k3 = jax.random.split(key, 3)
        images = random_rot90(k1, images)
        images = random_hflip(k2, images)
        return random_vflip(k3, images)
    return images
