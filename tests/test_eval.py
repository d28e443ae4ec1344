"""Tests for eval backbones and metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.eval import (
    cal_FID,
    cal_labelscore,
    compute_entropy,
    compute_prdc,
    frechet_distance,
    inception_score,
    intra_class_fid,
    predict_class_labels,
    sliding_window_eval,
)
from ccdm_tpu.eval.backbones import AEEncoder, AEDecoder, ResNetEval


def test_frechet_distance_identity(rng):
    X = rng.normal(0, 1, (2000, 8))
    assert frechet_distance(X, X.copy()) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_mean_shift(rng):
    X = rng.normal(0, 1, (5000, 4))
    Y = X + 2.0
    # FID >= ||mu_diff||^2 = 16 for identical covariances
    assert frechet_distance(X, Y) == pytest.approx(16.0, rel=0.05)


def test_entropy():
    assert compute_entropy(np.array([0, 0, 0, 0])) == pytest.approx(0.0)
    assert compute_entropy(np.array([0, 1, 2, 3])) == pytest.approx(np.log(4))


@pytest.mark.slow  # compile-heavy (~50s); encoder exercised by test_cal_fid
def test_ae_encoder_decoder_shapes():
    enc = AEEncoder(dim_bottleneck=64, ch=8)
    dec = AEDecoder(ch=8, nc=3)
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 64, 64, 3))
    ev = enc.init(k, x, train=False)
    f = enc.apply(ev, x, train=False)
    assert f.shape == (2, 64)
    dv = dec.init(k, f, train=False)
    xh = dec.apply(dv, f, train=False)
    assert xh.shape == (2, 64, 64, 3)


def test_resnet_eval_heads():
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 3))
    cls = ResNetEval(num_outputs=7, mode="class", num_blocks=(1, 1, 1, 1))
    cv = cls.init(k, x, train=False)
    logits, feat = cls.apply(cv, x, train=False)
    assert logits.shape == (2, 7) and feat.shape == (2, 512)
    reg = ResNetEval(num_outputs=1, mode="regre", num_blocks=(1, 1, 1, 1))
    rv = reg.init(k, x, train=False)
    pred, _ = reg.apply(rv, x, train=False)
    assert pred.shape == (2, 1) and float(pred.min()) >= 0


@pytest.fixture(scope="module")
def tiny_eval_nets():
    k = jax.random.PRNGKey(1)
    x = jnp.zeros((2, 16, 16, 3))
    fid_net = AEEncoder(dim_bottleneck=16, ch=4)
    fid_v = fid_net.init(k, x, train=False)
    ls_net = ResNetEval(num_outputs=1, mode="regre", num_blocks=(1, 1, 1, 1))
    ls_v = ls_net.init(k, x, train=False)
    cls_net = ResNetEval(num_outputs=5, mode="class", num_blocks=(1, 1, 1, 1))
    cls_v = cls_net.init(k, x, train=False)
    return (fid_net, fid_v), (ls_net, ls_v), (cls_net, cls_v)


def test_cal_fid_and_labelscore(tiny_eval_nets, rng):
    (fid_net, fid_v), (ls_net, ls_v), (cls_net, cls_v) = tiny_eval_nets
    real = rng.integers(0, 255, (32, 16, 16, 3), dtype=np.uint8)
    fake = rng.integers(0, 255, (24, 16, 16, 3), dtype=np.uint8)
    fid = cal_FID(fid_net.apply, fid_v, real, fake, batch_size=16)
    assert np.isfinite(fid) and fid >= -1e-3
    ls_mean, ls_std = cal_labelscore(
        ls_net.apply, ls_v, fake, rng.uniform(0, 1, 24), 0.0, 90.0, batch_size=16
    )
    assert np.isfinite(ls_mean) and ls_mean >= 0
    preds = predict_class_labels(cls_net.apply, cls_v, fake, batch_size=16)
    assert preds.shape == (24,) and preds.max() < 5
    is_mean, is_std = inception_score(cls_net.apply, cls_v, fake, 5, batch_size=8)
    assert np.isfinite(is_mean) and is_mean >= 1.0 - 1e-3


def test_prdc_identical_sets(rng):
    """Same manifold -> every fake is inside the real manifold and vice
    versa: precision = recall = coverage = 1, density ~ 1."""
    X = rng.normal(0, 1, (256, 16)).astype(np.float32)
    out = compute_prdc(X, X.copy(), nearest_k=5)
    assert out["precision"] == pytest.approx(1.0)
    assert out["recall"] == pytest.approx(1.0)
    assert out["coverage"] == pytest.approx(1.0)
    assert out["density"] > 0.9


def test_prdc_disjoint_sets(rng):
    """Far-apart manifolds -> precision/recall/coverage collapse to 0."""
    X = rng.normal(0, 1, (256, 16)).astype(np.float32)
    Y = rng.normal(100, 1, (256, 16)).astype(np.float32)
    out = compute_prdc(X, Y, nearest_k=5)
    assert out["precision"] == pytest.approx(0.0)
    assert out["recall"] == pytest.approx(0.0)
    assert out["density"] == pytest.approx(0.0)
    assert out["coverage"] == pytest.approx(0.0)


def test_prdc_match_n_removes_set_size_bias(rng):
    """match_n=True evaluates at equal set sizes (the protocol of Naeem et
    al. / StudioGAN's worker): unequal sizes shift the k-NN ball geometry
    (more fakes -> more, smaller balls -> recall drifts up; vice versa for
    precision), so matched numbers are the comparable ones. Assert the
    matched result lands at the equal-N same-distribution control and that
    the subsample is seeded-deterministic."""
    Xr = rng.normal(0, 1, (200, 2)).astype(np.float32)
    Xg = rng.normal(0, 1, (3200, 2)).astype(np.float32)
    matched = compute_prdc(Xr, Xg, nearest_k=5, match_n=True, seed=0)
    ctrl = compute_prdc(Xr, rng.normal(0, 1, (200, 2)).astype(np.float32),
                        nearest_k=5)
    for key in ("precision", "recall", "coverage"):
        assert matched[key] == pytest.approx(ctrl[key], abs=0.15), key
    # subsampling is seeded-deterministic, and the sets really were reduced
    again = compute_prdc(Xr, Xg, nearest_k=5, match_n=True, seed=0)
    assert again == matched


def test_prdc_matches_numpy_oracle(rng):
    """Bitwise semantics vs a numpy transcription of StudioGAN
    prdc.py:128-168 (kth-NN radii excluding self, strict <)."""
    Xr = rng.normal(0, 1, (64, 8)).astype(np.float32)
    Xg = rng.normal(0.5, 1.2, (48, 8)).astype(np.float32)
    k = 3

    def pd(a, b):
        return np.sqrt(np.maximum(
            (a * a).sum(1)[:, None] + (b * b).sum(1)[None] - 2 * a @ b.T, 0))

    rr = np.sort(pd(Xr, Xr), axis=1)[:, k]  # k+1 smallest incl. self-0
    fr = np.sort(pd(Xg, Xg), axis=1)[:, k]
    drf = pd(Xr, Xg)
    want = dict(
        precision=(drf < rr[:, None]).any(0).mean(),
        recall=(drf < fr[None, :]).any(1).mean(),
        density=(drf < rr[:, None]).sum(0).mean() / k,
        coverage=(drf.min(1) < rr).mean(),
    )
    got = compute_prdc(Xr, Xg, nearest_k=k)
    for key in want:
        assert got[key] == pytest.approx(float(want[key]), abs=1e-5), key


def test_intra_class_fid(tiny_eval_nets, rng):
    (fid_net, fid_v), _, _ = tiny_eval_nets
    real = rng.integers(0, 255, (40, 16, 16, 3), dtype=np.uint8)
    fake = rng.integers(0, 255, (40, 16, 16, 3), dtype=np.uint8)
    classes = np.repeat(np.arange(4), 10)
    m, s, per = intra_class_fid(fid_net.apply, fid_v, real, classes, fake, classes,
                                batch_size=16)
    assert np.isfinite(m) and len(per) == 4
    # skipping classes absent on the fake side
    m2, _, per2 = intra_class_fid(fid_net.apply, fid_v, real, classes,
                                  fake[:20], classes[:20], batch_size=16)
    assert len(per2) == 2


def test_sliding_window_protocol(tiny_eval_nets, rng):
    (fid_net, fid_v), (ls_net, ls_v), (cls_net, cls_v) = tiny_eval_nets
    n = 64
    real_labels = rng.uniform(1, 10, n)
    fake_labels = rng.uniform(1, 10, n)
    real = rng.integers(0, 255, (n, 16, 16, 3), dtype=np.uint8)
    fake = rng.integers(0, 255, (n, 16, 16, 3), dtype=np.uint8)
    res = sliding_window_eval(
        real, real_labels, fake, fake_labels,
        fn_norm_labels=lambda y: np.asarray(y) / 10.0,
        fid_apply=fid_net.apply, fid_variables=fid_v,
        ls_apply=ls_net.apply, ls_variables=ls_v,
        div_apply=cls_net.apply, div_variables=cls_v,
        fid_radius=2.0, num_centers=3,
        max_label_after_shift=10.0, batch_size=16, verbose=False,
    )
    assert len(res.centers) == 3
    sfid_mean, sfid_std = res.sfid
    assert np.isfinite(sfid_mean)
    ls_mean, _ = res.ls
    assert np.isfinite(ls_mean)
