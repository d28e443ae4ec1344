"""Native NIQE (eval/niqe.py) — estimator correctness + ordering contract.

The reference has no in-repo NIQE (external MATLAB, vanilla
main.py:498-513); these tests pin our implementation of the published
algorithm (Mittal et al., IEEE SPL 2013) instead: the GGD/AGGD moment
estimators against known distributions, and the end-to-end contract that
distorted images score WORSE (higher) than pristine held-out images under a
model fitted on pristine data.
"""

import numpy as np
import pytest

from ccdm_tpu.eval.niqe import (
    NIQEModel,
    default_patch_for,
    fit_aggd,
    fit_ggd,
    fit_niqe_model,
    image_patch_features,
    mscn_coefficients,
    niqe_score,
)


def test_ggd_recovers_gaussian_and_laplacian():
    rng = np.random.default_rng(0)
    a_g, _ = fit_ggd(rng.normal(0, 1, 200_000))
    assert abs(a_g - 2.0) < 0.1  # Gaussian is GGD with alpha=2
    a_l, _ = fit_ggd(rng.laplace(0, 1, 200_000))
    assert abs(a_l - 1.0) < 0.1  # Laplacian is GGD with alpha=1


def test_aggd_symmetric_has_zero_eta():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 200_000)
    alpha, eta, bl, br = fit_aggd(x)
    assert abs(eta) < 0.02
    assert abs(bl - br) < 0.05
    assert abs(alpha - 2.0) < 0.15


def test_aggd_skewed_eta_sign():
    rng = np.random.default_rng(2)
    # right-heavy: positive side has larger scale -> eta > 0
    x = np.where(rng.uniform(size=100_000) < 0.5,
                 np.abs(rng.normal(0, 2.0, 100_000)),
                 -np.abs(rng.normal(0, 0.5, 100_000)))
    _, eta, bl, br = fit_aggd(x)
    assert eta > 0 and br > bl


def test_mscn_whitens_natural_structure():
    rng = np.random.default_rng(3)
    # smooth image: MSCN should be near-decorrelated and roughly unit-ish std
    base = rng.normal(0, 1, (64, 64))
    from scipy import ndimage
    img = ndimage.gaussian_filter(base, 2.0) * 60 + 128
    mscn, sigma = mscn_coefficients(img)
    assert mscn.shape == img.shape and sigma.min() >= 0
    assert abs(float(np.mean(mscn))) < 0.05


def test_patch_features_shape_and_determinism():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (64, 64, 1), dtype=np.uint8)
    f1 = image_patch_features(img, patch=32)
    f2 = image_patch_features(img, patch=32)
    assert f1.shape == (4, 36)
    np.testing.assert_array_equal(f1, f2)


def _textured_images(rng, n, size=64):
    """Pristine-ish corpus: smooth blobs + mild texture (not pure noise)."""
    from scipy import ndimage
    imgs = []
    for _ in range(n):
        a = ndimage.gaussian_filter(rng.normal(0, 1, (size, size)), 3.0)
        a = a + 0.15 * ndimage.gaussian_filter(rng.normal(0, 1, (size, size)), 0.8)
        a = (a - a.min()) / (np.ptp(a) + 1e-9)
        imgs.append((a * 255).astype(np.uint8)[..., None])
    return np.stack(imgs)


def test_niqe_orders_pristine_below_distorted(tmp_path):
    rng = np.random.default_rng(5)
    corpus = _textured_images(rng, 48)
    model = fit_niqe_model(corpus[:32], patch=32)

    held_out = corpus[32:]
    noisy = np.clip(held_out.astype(np.int32)
                    + rng.normal(0, 60, held_out.shape).astype(np.int32),
                    0, 255).astype(np.uint8)
    s_clean = niqe_score(held_out, model)
    s_noisy = niqe_score(noisy, model)
    assert s_clean.shape == (16,)
    assert s_noisy.mean() > 1.5 * s_clean.mean()

    # save/load roundtrip preserves scores exactly
    p = str(tmp_path / "niqe_model.npz")
    model.save(p)
    model2 = NIQEModel.load(p)
    np.testing.assert_allclose(niqe_score(held_out[:3], model2),
                               s_clean[:3], rtol=0, atol=0)


def test_niqe_blur_is_distortion():
    from scipy import ndimage
    rng = np.random.default_rng(6)
    corpus = _textured_images(rng, 40)
    model = fit_niqe_model(corpus[:28], patch=32)
    held = corpus[28:]
    blurred = np.stack([
        ndimage.gaussian_filter(im[..., 0].astype(np.float64), 4.0)
        for im in held]).astype(np.uint8)[..., None]
    assert niqe_score(blurred, model).mean() > niqe_score(held, model).mean()


def test_default_patch_for():
    assert default_patch_for(64) == 32
    assert default_patch_for(128) == 64
    assert default_patch_for(192) == 96
    assert default_patch_for(16) == 16
