"""Golden tests: vicinal weights vs a numpy oracle transcribed from the
reference semantics (`CCDM_unified/diffusion.py:596-733`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.ops import (
    pairwise_distance,
    sliced_batch_weights,
    classic_batch_weights,
    hard_weights_from_targets,
    soft_weights_from_targets,
)
from ccdm_tpu.ops.vicinal import random_projection_vectors


def oracle_classic(labels, kappa, hard, distance, null_mask):
    """Loop-based transcription of the reference's classic weighting."""
    b = len(labels)
    labels = np.atleast_2d(labels)
    if labels.shape[0] == 1 and b > 1:
        labels = labels.T
    w = np.zeros(b)
    for i in range(b):
        for j in range(b):
            d = labels[i] - labels[j]
            if labels.shape[1] == 1:
                dist = abs(d[0])
            elif distance == "l2":
                dist = np.sqrt((d**2).sum())
            elif distance == "l1":
                dist = np.abs(d).sum()
            else:
                a_, b_ = labels[i], labels[j]
                dist = 1 - a_ @ b_ / (np.linalg.norm(a_) * np.linalg.norm(b_) + 1e-12)
            if hard:
                w[i] += float(dist <= kappa)
            else:
                w[i] += np.exp(-(dist**2) / kappa**2)
    w = w / b
    if null_mask is not None:
        w[null_mask] = 1.0
    return w


@pytest.mark.parametrize("hard", [True, False])
@pytest.mark.parametrize("distance", ["l1", "l2", "cosine"])
def test_classic_weights_multidim(rng, hard, distance):
    labels = rng.uniform(0.05, 1, (16, 3)).astype(np.float32)
    null = rng.random(16) < 0.3
    kappa = 0.4
    got = np.asarray(classic_batch_weights(jnp.asarray(labels), kappa, hard, distance, jnp.asarray(null)))
    want = oracle_classic(labels, kappa, hard, distance, null)
    # f32 device math vs f64 oracle: exp(-d^2/k^2) amplifies the ~1e-7 f32
    # cancellation in (1 - cos_sim); 3e-3 relative is the expected envelope.
    tol = 3e-3 if distance == "cosine" else 1e-4
    np.testing.assert_allclose(got, want, rtol=tol, atol=1e-5)


@pytest.mark.parametrize("hard", [True, False])
def test_classic_weights_scalar(rng, hard):
    labels = rng.uniform(0, 1, (32, 1)).astype(np.float32)
    kappa = 0.05
    got = np.asarray(classic_batch_weights(jnp.asarray(labels), kappa, hard, "l2", None))
    want = oracle_classic(labels, kappa, hard, "l2", None)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def oracle_sliced(labels, vecs, kappa, hard, null_mask):
    b, _ = labels.shape
    m = vecs.shape[0]
    w = np.zeros(b)
    for v in vecs:
        vn = v / (np.linalg.norm(v) + 1e-8)
        proj = labels @ vn
        diff = proj[:, None] - proj[None, :]
        if hard:
            ek = kappa * np.linalg.norm(v) + 1e-8
            w += (np.abs(diff) <= ek).sum(axis=1) / m
        else:
            w += np.exp(-(diff**2) / kappa**2).sum(axis=1) / m
    w = w / b
    if null_mask is not None:
        w[null_mask] = 1.0
    return w


@pytest.mark.parametrize("hard", [True, False])
@pytest.mark.parametrize("vector_type", ["gaussian", "rademacher", "sphere"])
def test_sliced_weights(rng, hard, vector_type):
    labels = rng.uniform(0, 1, (12, 5)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    vecs = np.asarray(random_projection_vectors(key, vector_type, 5, 7))
    null = rng.random(12) < 0.25
    kappa = 0.3
    got = np.asarray(
        sliced_batch_weights(jnp.asarray(labels), jnp.asarray(vecs), kappa, hard, jnp.asarray(null))
    )
    want = oracle_sliced(labels, vecs, kappa, hard, null)
    # f32 exp(-nu*d^2) vs f64 oracle envelope
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-5)


def test_projection_vector_types():
    key = jax.random.PRNGKey(0)
    r = np.asarray(random_projection_vectors(key, "rademacher", 4, 100))
    assert set(np.unique(r)) <= {-1.0, 1.0}
    s = np.asarray(random_projection_vectors(key, "sphere", 4, 100))
    np.testing.assert_allclose(np.linalg.norm(s, axis=1), 1.0, atol=1e-5)


def test_pairwise_distance_scalar_matches_abs(rng):
    a = rng.uniform(0, 1, (8, 1)).astype(np.float32)
    b = rng.uniform(0, 1, (5, 1)).astype(np.float32)
    got = np.asarray(pairwise_distance(jnp.asarray(a), jnp.asarray(b), "cosine"))
    want = np.abs(a - b.T)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_target_weights(rng):
    bl = rng.uniform(0, 1, (16, 1)).astype(np.float32)
    tl = rng.uniform(0, 1, (16, 1)).astype(np.float32)
    kappa = 0.1
    hw = np.asarray(hard_weights_from_targets(jnp.asarray(bl), jnp.asarray(tl), kappa))
    want_h = (np.abs(bl - tl)[:, 0] <= kappa).astype(np.float32)
    np.testing.assert_array_equal(hw, want_h)
    sw = np.asarray(soft_weights_from_targets(jnp.asarray(bl), jnp.asarray(tl), kappa))
    want_s = np.exp(-np.abs(bl - tl)[:, 0] ** 2 / kappa**2)
    # atol floor absorbs f32 denormal flushing for exp(-huge)
    np.testing.assert_allclose(sw, want_s, rtol=5e-3, atol=1e-30)
