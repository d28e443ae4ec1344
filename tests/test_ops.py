"""Tests for guidance + image ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.ops import project_parallel, apply_cfg
from ccdm_tpu.ops.image import (
    normalize_images,
    to_uint8,
    random_hflip,
    random_vflip,
    random_rot90,
    augment_for_dataset,
)


def test_project_parallel_decomposition():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (4, 8, 8, 3))
    y = jax.random.normal(k2, (4, 8, 8, 3))
    par, orth = project_parallel(x, y)
    # decomposition sums to x
    np.testing.assert_allclose(np.asarray(par + orth), np.asarray(x), atol=1e-5)
    # orthogonal component is orthogonal to y per row
    dots = np.asarray(jnp.sum(orth.reshape(4, -1) * y.reshape(4, -1), axis=-1))
    np.testing.assert_allclose(dots, 0.0, atol=1e-3)
    # f64 oracle agreement
    xf = np.asarray(x, dtype=np.float64).reshape(4, -1)
    yf = np.asarray(y, dtype=np.float64).reshape(4, -1)
    unit = yf / np.linalg.norm(yf, axis=-1, keepdims=True)
    want_par = (xf * unit).sum(-1, keepdims=True) * unit
    np.testing.assert_allclose(np.asarray(par).reshape(4, -1), want_par, atol=1e-4)


def test_apply_cfg_scale_one_is_identity():
    x = jnp.ones((2, 4, 4, 3))
    n = jnp.zeros((2, 4, 4, 3))
    out, null = apply_cfg(x, n, cond_scale=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_apply_cfg_no_projection_matches_standard_cfg():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    c = jax.random.normal(k1, (3, 4, 4, 3))
    u = jax.random.normal(k2, (3, 4, 4, 3))
    out, _ = apply_cfg(c, u, cond_scale=2.0, remove_parallel_component=False)
    want = np.asarray(c) + (np.asarray(c) - np.asarray(u)) * 1.0
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_apply_cfg_rescaled_phi_preserves_std():
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    c = jax.random.normal(k1, (3, 8, 8, 3))
    u = jax.random.normal(k2, (3, 8, 8, 3))
    out, _ = apply_cfg(c, u, cond_scale=6.0, rescaled_phi=1.0)
    std_out = np.asarray(jnp.std(out, axis=(1, 2, 3)))
    std_c = np.asarray(jnp.std(c, axis=(1, 2, 3)))
    np.testing.assert_allclose(std_out, std_c, rtol=1e-3)


def test_normalize_roundtrip():
    imgs = jnp.arange(0, 256, dtype=jnp.uint8).reshape(1, 16, 16, 1)
    x = normalize_images(imgs)
    assert float(x.min()) == 0.0 and float(x.max()) == pytest.approx(1.0)
    back = to_uint8(x)
    # truncating quantization (reference semantics: (x*255).type(torch.uint8))
    diff = np.abs(np.asarray(back).astype(int) - np.asarray(imgs).astype(int))
    assert diff.max() <= 1


def test_flips_are_involutions_and_permutations():
    key = jax.random.PRNGKey(3)
    imgs = jax.random.uniform(key, (8, 6, 6, 3))
    for fn in (random_hflip, random_vflip):
        out = fn(key, imgs, p=1.0)
        again = fn(key, out, p=1.0)
        np.testing.assert_allclose(np.asarray(again), np.asarray(imgs), atol=1e-7)
        # pixel multiset preserved per sample
        np.testing.assert_allclose(
            np.sort(np.asarray(out).reshape(8, -1), axis=1),
            np.sort(np.asarray(imgs).reshape(8, -1), axis=1),
        )


def test_rot90_matches_numpy():
    key = jax.random.PRNGKey(4)
    imgs = jax.random.uniform(key, (16, 5, 5, 2))
    out = np.asarray(random_rot90(key, imgs))
    src = np.asarray(imgs)
    # every output must equal one of np.rot90(k) of its input
    for i in range(16):
        ok = any(
            np.allclose(out[i], np.rot90(src[i], k=k, axes=(0, 1)), atol=1e-7)
            for k in range(4)
        )
        assert ok, f"sample {i} is not a rot90 of its source"


def test_augment_policy_dispatch():
    key = jax.random.PRNGKey(5)
    imgs = jax.random.uniform(key, (4, 8, 8, 1))
    # RC-49 / SteeringAngle: identity
    np.testing.assert_array_equal(
        np.asarray(augment_for_dataset("RC-49", key, imgs)), np.asarray(imgs)
    )
    out = augment_for_dataset("Cell200", key, imgs)
    assert out.shape == imgs.shape
