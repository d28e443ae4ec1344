"""StudioGAN worker-analysis parity tooling (eval/analysis.py).

Reference semantics: CCDM_vanilla/.../StudioGAN/worker.py:1068-1641.
"""

import numpy as np
import pytest

from ccdm_tpu.eval import analysis


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_knn_finds_planted_neighbors(rng):
    """The nearest real to a fake that IS a real image must be that image."""
    reals = rng.integers(0, 255, (32, 8, 8, 3), dtype=np.uint8)
    fakes = np.stack([reals[5], reals[17]])  # anchors planted in the reals
    grid = analysis.k_nearest_neighbors(fakes, reals, k=3, anchors=2)
    assert grid.shape == (2, 4, 8, 8, 3)
    np.testing.assert_array_equal(grid[0, 0], grid[0, 1])  # anchor == NN1
    np.testing.assert_array_equal(grid[1, 0], grid[1, 1])


def test_knn_with_embed_fn(rng):
    """Feature-space kNN: an embed_fn that keys on the mean groups by it."""
    reals = np.zeros((10, 4, 4, 3), np.uint8)
    reals[5:] = 200
    fakes = np.full((1, 4, 4, 3), 190, np.uint8)
    grid = analysis.k_nearest_neighbors(
        fakes, reals, k=2, anchors=1,
        embed_fn=lambda x: x.reshape(len(x), -1).mean(1, keepdims=True))
    assert grid[0, 1].mean() > 100  # bright anchors match bright reals
    assert grid[0, 2].mean() > 100


def test_linear_interpolation_endpoints(rng):
    """gen_fn=identity on z: endpoints must be z0 and z1 exactly."""
    import jax.numpy as jnp

    z0 = jnp.asarray(rng.normal(size=(4, 4, 1)).astype(np.float32))
    z1 = jnp.asarray(rng.normal(size=(4, 4, 1)).astype(np.float32))
    y = jnp.zeros((2,))
    out = analysis.linear_interpolation(lambda z, _: z, z0, z1, y, y, steps=5)
    np.testing.assert_allclose(out[0], np.asarray(z0), rtol=1e-6)
    np.testing.assert_allclose(out[-1], np.asarray(z1), rtol=1e-6)
    np.testing.assert_allclose(out[2], 0.5 * np.asarray(z0 + z1), rtol=1e-5)


def test_frequency_spectrum_flags_highfreq_deficit(rng):
    """Fakes that are blurred reals must show lower high-frequency energy —
    the artifact the reference's analysis exists to surface."""
    reals = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    blurred = reals.astype(np.float32)
    blurred = (blurred + np.roll(blurred, 1, 1) + np.roll(blurred, 1, 2)
               + np.roll(blurred, -1, 1) + np.roll(blurred, -1, 2)) / 5
    rs, fs = analysis.frequency_spectrum(reals, blurred.astype(np.uint8))
    assert rs.shape == (32, 32) and fs.shape == (32, 32)
    edge = np.s_[..., :4, :]  # top rows of the shifted spectrum = high freq
    assert fs[edge].mean() < rs[edge].mean()


def test_tsne_separates_clusters(rng):
    """Two well-separated feature clusters stay separated in 2-D."""
    real = rng.normal(0, 0.1, (30, 16)).astype(np.float32)
    fake = rng.normal(8, 0.1, (30, 16)).astype(np.float32)
    r2, f2 = analysis.tsne_embeds(real, fake, n_iter=260, seed=0)
    assert r2.shape == (30, 2) and f2.shape == (30, 2)
    inter = np.linalg.norm(r2.mean(0) - f2.mean(0))
    intra = max(r2.std(), f2.std())
    assert inter > intra  # clusters distinguishable


def test_semantic_factorization_axes_orthogonal(rng):
    """SeFa axes are the top singular directions; rows start at gen(z)."""
    import jax.numpy as jnp

    zd = 16
    kernel = jnp.asarray(rng.normal(size=(zd, 32)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(zd,)).astype(np.float32))
    y = jnp.zeros((4,))
    canvas = analysis.semantic_factorization(
        lambda zz, yy: zz, kernel, z, y, num_axes=3, num_cols=5,
        max_variation=2.0)
    assert canvas.shape == (3, 5, zd)
    for a in range(3):  # every walk starts at the anchor z
        np.testing.assert_allclose(canvas[a, 0], np.asarray(z), rtol=1e-5)
    # endpoints differ from the anchor along orthogonal directions
    d0 = canvas[0, -1] - canvas[0, 0]
    d1 = canvas[1, -1] - canvas[1, 0]
    cos = abs(np.dot(d0, d1) / (np.linalg.norm(d0) * np.linalg.norm(d1)))
    assert cos < 1e-4


@pytest.mark.slow
def test_gan_train_accuracy_separable(rng):
    """CAS on a trivially separable synthetic set should beat chance."""
    n, img = 80, 16
    labels = rng.integers(0, 2, n).astype(np.int32)
    images = (labels[:, None, None, None] * 180
              + rng.integers(0, 60, (n, img, img, 3))).astype(np.uint8)
    acc = analysis.gan_train_test_accuracy(images[:48], labels[:48],
                                           images[48:], labels[48:],
                                           num_classes=2, epochs=40)
    assert acc > 0.7
