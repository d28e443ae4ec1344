"""Tests for the native C++ mmap dataset cache (skipped without toolchain)."""

import numpy as np
import pytest

from ccdm_tpu.data.native_loader import NativeDatasetCache

pytestmark = pytest.mark.skipif(
    not NativeDatasetCache.available(), reason="libccdm_io.so not buildable"
)


@pytest.fixture()
def cache(tmp_path, rng):
    imgs = rng.integers(0, 255, (64, 8, 8, 3), dtype=np.uint8)
    labs = np.linspace(0, 1, 64).astype(np.float32)
    path = str(tmp_path / "ds.ccdmcache")
    NativeDatasetCache.write(path, imgs, labs)
    return NativeDatasetCache(path), imgs, labs


def test_info(cache):
    c, imgs, labs = cache
    assert (c.n, c.h, c.w, c.c, c.ldim) == (64, 8, 8, 3, 1)


def test_gather_exact(cache, rng):
    c, imgs, labs = cache
    idx = rng.integers(0, 64, 17)
    gi, gl = c.gather(idx)
    np.testing.assert_array_equal(gi, imgs[idx])
    np.testing.assert_allclose(gl[:, 0], labs[idx], atol=1e-7)


def test_gather_hflip_is_permutation(cache):
    c, imgs, labs = cache
    gi, _ = c.gather(np.zeros(32, np.int64), hflip=True, seed=3)
    for g in gi:
        assert np.array_equal(g, imgs[0]) or np.array_equal(g, imgs[0][:, ::-1])
    # both orientations occur with high probability
    n_flipped = sum(not np.array_equal(g, imgs[0]) for g in gi)
    assert 0 < n_flipped < 32


def test_gather_threaded_matches_single(cache, rng):
    c, imgs, labs = cache
    idx = rng.integers(0, 64, 50)
    a, _ = c.gather(idx, num_threads=1)
    b, _ = c.gather(idx, num_threads=8)
    np.testing.assert_array_equal(a, b)


def test_multidim_labels(tmp_path, rng):
    imgs = rng.integers(0, 255, (10, 4, 4, 1), dtype=np.uint8)
    labs = rng.uniform(0, 1, (10, 5)).astype(np.float32)
    path = str(tmp_path / "md.ccdmcache")
    NativeDatasetCache.write(path, imgs, labs)
    c = NativeDatasetCache(path)
    assert c.ldim == 5
    gi, gl = c.gather(np.array([3]))
    np.testing.assert_allclose(gl[0], labs[3])
