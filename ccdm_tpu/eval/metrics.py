"""Evaluation metrics: FID, Label Score, Diversity entropy, Inception Score.

TPU-native re-design of `CCDM_vanilla/.../eval_metrics.py:43-271` and
`utils.py:125-180`: feature extraction runs as a jitted batched apply on
device; the Frechet algebra stays in f64 numpy/scipy on host (matrix sqrtm
is tiny — 512x512 — and precision-sensitive).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg


def frechet_distance(Xr: np.ndarray, Xg: np.ndarray, eps: float = 1e-10) -> float:
    """FID between feature sets [N,d] (eval_metrics.py:43-70)."""
    mu_r, mu_g = Xr.mean(axis=0), Xg.mean(axis=0)
    diff = mu_r - mu_g
    cov_r = np.cov(Xr.T)
    cov_g = np.cov(Xg.T)
    covmean, _ = linalg.sqrtm(cov_r.dot(cov_g), disp=False)
    covmean = covmean.real
    if not np.isfinite(covmean).all():
        offset = np.eye(cov_r.shape[0]) * eps
        covmean = linalg.sqrtm((cov_r + offset).dot(cov_g + offset)).real
    return float(diff.dot(diff) + np.trace(cov_r + cov_g - 2 * covmean))


def _batched_apply(fn: Callable, images: np.ndarray, batch_size: int) -> np.ndarray:
    """Run a jitted per-batch fn over images with fixed-shape padding."""
    n = len(images)
    batch_size = min(batch_size, n)
    outs = []
    done = 0
    while done < n:
        chunk = images[done:done + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
        out = np.asarray(fn(jnp.asarray(chunk)))
        outs.append(out[: len(out) - pad or None])
        done += batch_size
    return np.concatenate(outs, axis=0)[:n]


def extract_features(apply_fn: Callable, variables: dict, images: np.ndarray,
                     batch_size: int = 200, normalize: bool = True) -> np.ndarray:
    """images: [N,H,W,C] uint8 or [-1,1] floats -> [N,d] features."""

    @jax.jit
    def fn(x):
        if normalize:
            x = x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        out = apply_fn(variables, x, train=False)
        return out[1] if isinstance(out, tuple) else out

    return _batched_apply(fn, images, batch_size)


def cal_FID(apply_fn: Callable, variables: dict, images_real: np.ndarray,
            images_fake: np.ndarray, batch_size: int = 200,
            norm_img: bool = True) -> float:
    """FID from raw image sets via the given feature net
    (eval_metrics.py:78-146)."""
    Xr = extract_features(apply_fn, variables, images_real, batch_size, norm_img)
    Xg = extract_features(apply_fn, variables, images_fake, batch_size, norm_img)
    return frechet_distance(Xr, Xg, eps=1e-6)


def predict_labels(apply_fn: Callable, variables: dict, images: np.ndarray,
                   batch_size: int = 200, norm_img: bool = True) -> np.ndarray:
    """Per-image NORMALIZED label predictions of a regre eval net [N]."""

    @jax.jit
    def fn(x):
        if norm_img:
            x = x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        out = apply_fn(variables, x, train=False)
        pred = out[0] if isinstance(out, tuple) else out
        return pred.reshape(-1)

    return _batched_apply(fn, images, batch_size).reshape(-1)


def labelscore_from_preds(preds: np.ndarray, labels_assigned: np.ndarray,
                          min_label_before_shift: float,
                          max_label_after_shift: float) -> Tuple[float, float]:
    denorm = lambda y: y * max_label_after_shift - abs(min_label_before_shift)
    err = np.abs(denorm(np.asarray(preds).reshape(-1))
                 - denorm(np.asarray(labels_assigned).reshape(-1)))
    return float(err.mean()), float(err.std())


def cal_labelscore(apply_fn: Callable, variables: dict, images: np.ndarray,
                   labels_assigned: np.ndarray, min_label_before_shift: float,
                   max_label_after_shift: float, batch_size: int = 200,
                   norm_img: bool = True) -> Tuple[float, float]:
    """Mean/std |y_pred - y_assigned| after denormalization
    (eval_metrics.py:157-207). labels_assigned are NORMALIZED."""
    preds = predict_labels(apply_fn, variables, images, batch_size, norm_img)
    return labelscore_from_preds(preds, labels_assigned,
                                 min_label_before_shift, max_label_after_shift)


def predict_class_labels(apply_fn: Callable, variables: dict, images: np.ndarray,
                         batch_size: int = 200, norm_img: bool = True) -> np.ndarray:
    """Argmax class predictions (utils.py:131-160 semantics)."""

    @jax.jit
    def fn(x):
        if norm_img:
            x = x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        out = apply_fn(variables, x, train=False)
        logits = out[0] if isinstance(out, tuple) else out
        return jnp.argmax(logits, axis=-1)

    return _batched_apply(fn, images, batch_size)


def compute_entropy(labels: np.ndarray, base: Optional[float] = None) -> float:
    """Shannon entropy of a label histogram (utils.py:125-129)."""
    _, counts = np.unique(labels, return_counts=True)
    p = counts / counts.sum()
    base = base if base is not None else np.e
    return float(-(p * np.log(p) / np.log(base)).sum())


def _pairwise_euclidean(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """[N,d] x [M,d] -> [N,M] Euclidean distances (f32, MXU-friendly)."""
    x2 = jnp.sum(x * x, axis=1)[:, None]
    y2 = jnp.sum(y * y, axis=1)[None, :]
    sq = x2 + y2 - 2.0 * (x @ y.T)
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def _kth_nn_radius(feats: jnp.ndarray, k: int) -> jnp.ndarray:
    """Distance to the k-th nearest neighbour (self excluded) per row —
    the manifold radius of StudioGAN prdc.py:101-126."""
    d = _pairwise_euclidean(feats, feats)
    # k+1 smallest includes the 0 self-distance; its max is the k-th NN
    neg_topk, _ = jax.lax.top_k(-d, k + 1)
    return -neg_topk[:, -1]


def compute_prdc(real_features: np.ndarray, fake_features: np.ndarray,
                 nearest_k: int = 5, match_n: bool = False,
                 seed: int = 0) -> dict:
    """Precision / Recall / Density / Coverage (Naeem et al. 2020).

    Numerical semantics of `StudioGAN/metrics/prdc.py:128-168`, re-designed
    as one jitted pairwise computation (the reference shells out to sklearn
    with n_jobs=8); suitable for the per-window set sizes of the SFID
    protocol (thousands of samples).

    match_n subsamples the larger set to the smaller one (seeded) before
    computing. The k-NN radii shrink ~ N^(-1/d) with set density, so recall
    computed with 4x more fakes than reals is biased low against a fixed
    real manifold (and precision vice versa); Naeem et al.'s protocol and
    StudioGAN's worker both evaluate at equal sample counts.
    """
    real_features = np.asarray(real_features, np.float32)
    fake_features = np.asarray(fake_features, np.float32)
    if match_n and len(real_features) != len(fake_features):
        n = min(len(real_features), len(fake_features))
        rs = np.random.RandomState(seed)
        if len(real_features) > n:
            real_features = real_features[rs.choice(len(real_features), n, replace=False)]
        if len(fake_features) > n:
            fake_features = fake_features[rs.choice(len(fake_features), n, replace=False)]
    xr = jnp.asarray(real_features)
    xg = jnp.asarray(fake_features)

    @jax.jit
    def _prdc(xr, xg):
        r_radii = _kth_nn_radius(xr, nearest_k)  # [Nr]
        f_radii = _kth_nn_radius(xg, nearest_k)  # [Nf]
        d_rf = _pairwise_euclidean(xr, xg)  # [Nr, Nf]
        in_real_manifold = d_rf < r_radii[:, None]
        precision = jnp.mean(jnp.any(in_real_manifold, axis=0))
        recall = jnp.mean(jnp.any(d_rf < f_radii[None, :], axis=1))
        density = jnp.mean(jnp.sum(in_real_manifold, axis=0)) / nearest_k
        coverage = jnp.mean(jnp.min(d_rf, axis=1) < r_radii)
        return precision, recall, density, coverage

    p, r, d, c = (float(v) for v in _prdc(xr, xg))
    return dict(precision=p, recall=r, density=d, coverage=c)


def intra_class_fid(apply_fn: Callable, variables: dict,
                    images_real: np.ndarray, classes_real: np.ndarray,
                    images_fake: np.ndarray, classes_fake: np.ndarray,
                    batch_size: int = 200, norm_img: bool = True,
                    min_per_class: int = 2,
                    feats_real: Optional[np.ndarray] = None,
                    feats_fake: Optional[np.ndarray] = None):
    """Per-class FID (StudioGAN worker.py:1392-1466 'iFID'): features are
    extracted once, then Frechet distance per shared class. Returns
    (mean, std, {class: fid}). Classes with fewer than min_per_class samples
    on either side are skipped (covariance needs >=2).

    classes_* must be DISCRETE class ids sharing one binning (for raw
    continuous labels use train_backbones.bin_labels_to_classes with the
    real labels as ref — exact float equality between real and generated
    label values almost never holds). Pass feats_* to reuse features
    already extracted by the caller."""
    Xr = (feats_real if feats_real is not None
          else extract_features(apply_fn, variables, images_real, batch_size, norm_img))
    Xg = (feats_fake if feats_fake is not None
          else extract_features(apply_fn, variables, images_fake, batch_size, norm_img))
    cr = np.asarray(classes_real).reshape(-1)
    cg = np.asarray(classes_fake).reshape(-1)
    fids = {}
    for c in np.unique(cr):
        mr, mg = cr == c, cg == c
        if mr.sum() < min_per_class or mg.sum() < min_per_class:
            continue
        fids[c] = frechet_distance(Xr[mr], Xg[mg], eps=1e-6)
    vals = np.array(list(fids.values()), dtype=np.float64)
    if len(vals) == 0:
        return float("nan"), float("nan"), fids
    return float(vals.mean()), float(vals.std()), fids


def inception_score(apply_fn: Callable, variables: dict, images: np.ndarray,
                    num_classes: int, batch_size: int = 32, splits: int = 1,
                    norm_img: bool = True) -> Tuple[float, float]:
    """Entropy-based IS with the eval classifier as backbone
    (eval_metrics.py:215-271)."""

    @jax.jit
    def fn(x):
        if norm_img:
            x = x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        out = apply_fn(variables, x, train=False)
        logits = out[0] if isinstance(out, tuple) else out
        return jax.nn.softmax(logits, axis=-1)

    preds = _batched_apply(fn, images, batch_size)
    n = len(preds)
    scores = []
    for k in range(splits):
        part = preds[k * (n // splits):(k + 1) * (n // splits)]
        py = part.mean(axis=0)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12)[None, :])
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))
