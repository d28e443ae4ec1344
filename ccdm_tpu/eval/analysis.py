"""Qualitative analysis tooling — StudioGAN worker parity (B5 breadth).

TPU-native re-design of the analysis passes in the reference's
StudioGAN WORKER loop (`CCDM_vanilla/.../StudioGAN/worker.py`):

- k-nearest-neighbor grids        (ref worker.py:1068-1163)
- latent/label linear interpolation (ref worker.py:1164-1218)
- frequency (FFT spectrum) analysis (ref worker.py:1219-1295)
- t-SNE of embeddings, real vs fake (ref worker.py:1297-1392)
- GAN-train / GAN-test classifier accuracy (CAS; ref worker.py:1529-1641)

Design deltas vs the reference (deliberate, TPU-first):
- Embeddings come from a caller-supplied `embed_fn` (typically this
  framework's own trained AE encoder from `eval/backbones.py`) instead of a
  torch-hub ResNet50 download — the eval backbones are pinned/fingerprinted
  (`train_backbones.py`), so numbers stay comparable across runs and no
  network egress is required.
- Distance/FFT math is batched jax/numpy over full arrays, not per-image
  Python loops; everything static-shaped so XLA can fuse.
- Outputs are returned as arrays (grids/figures saved by the caller via
  `utils/image_io.py`), keeping this module free of matplotlib state.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _as_features(images: np.ndarray, embed_fn: Optional[Callable]) -> np.ndarray:
    """[N,H,W,C] uint8/float -> [N,F] float features (pixel-space fallback)."""
    if embed_fn is not None:
        return np.asarray(embed_fn(images), np.float32)
    x = np.asarray(images, np.float32)
    return x.reshape(x.shape[0], -1)


def k_nearest_neighbors(fake_images: np.ndarray, real_images: np.ndarray,
                        k: int = 7, embed_fn: Optional[Callable] = None,
                        anchors: int = 8,
                        real_features: Optional[np.ndarray] = None) -> np.ndarray:
    """For each of the first `anchors` fakes, find its k nearest reals.

    Returns a uint8 grid [anchors, k+1, H, W, C]: column 0 is the fake
    anchor, columns 1..k its nearest reals by feature L2 (ref
    worker.py:1068-1163 builds the same rows with ResNet50 embeddings and
    a per-class sampler; class restriction is the caller's slicing here).
    Pass real_features to reuse embeddings the caller already extracted.
    """
    fa = np.asarray(fake_images[:anchors])
    ff = _as_features(fa, embed_fn)
    rf = (np.asarray(real_features, np.float32) if real_features is not None
          else _as_features(real_images, embed_fn))
    # [A, N] squared distances on device, one fused matmul + broadcasts
    d = (jnp.sum(jnp.asarray(ff) ** 2, 1)[:, None]
         - 2.0 * jnp.asarray(ff) @ jnp.asarray(rf).T
         + jnp.sum(jnp.asarray(rf) ** 2, 1)[None, :])
    idx = np.asarray(jax.lax.top_k(-d, k)[1])  # [A, k] nearest indices
    rows = [np.concatenate([fa[i:i + 1], np.asarray(real_images)[idx[i]]], 0)
            for i in range(fa.shape[0])]
    return np.stack(rows).astype(np.uint8)


def linear_interpolation(gen_fn: Callable, z0: jnp.ndarray, z1: jnp.ndarray,
                         y0: jnp.ndarray, y1: jnp.ndarray,
                         steps: int = 8) -> np.ndarray:
    """Latent and/or label interpolation grid (ref worker.py:1164-1218).

    gen_fn(z, y) -> images. Interpolates BOTH z and y with the same weights
    (pass z0==z1 for fix_z, y0==y1 for fix_y, matching the reference's two
    modes). Returns [steps, H, W, C] float images from ONE batched call.
    """
    w = jnp.linspace(0.0, 1.0, steps).reshape(-1, *([1] * (z0.ndim)))
    z = (1 - w) * z0[None] + w * z1[None]
    wy = jnp.linspace(0.0, 1.0, steps).reshape(-1, *([1] * (y0.ndim)))
    y = (1 - wy) * y0[None] + wy * y1[None]
    return np.asarray(gen_fn(z.reshape(steps, *z0.shape),
                             y.reshape(steps, *y0.shape)))


def _median_filter(gray: np.ndarray, size: int) -> np.ndarray:
    """[N,H,W] per-image 2D median filter (scipy when present)."""
    try:
        from scipy import ndimage
        return np.stack([ndimage.median_filter(g, size=size) for g in gray])
    except ImportError:  # box-mean fallback keeps the high-pass meaningful
        from numpy.lib.stride_tricks import sliding_window_view
        p = size // 2
        padded = np.pad(gray, ((0, 0), (p, p), (p, p)), mode="edge")
        win = sliding_window_view(padded, (size, size), axis=(1, 2))
        return win.mean(axis=(-1, -2))[:, : gray.shape[1], : gray.shape[2]]


def frequency_spectrum(real_u8: np.ndarray, fake_u8: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Mean log-magnitude FFT spectra of median-high-passed grayscale images.

    Reference math (worker.py:1268-1289): gray = ITU-R 601 luma; per image
    subtract an H//8 median filter, fft2, fftshift, accumulate
    20*log|.|/N. Returns (real_spectrum, fake_spectrum), each [H, W].
    """
    def spectrum(u8: np.ndarray) -> np.ndarray:
        x = np.asarray(u8, np.float32)
        if x.ndim == 4 and x.shape[-1] == 3:
            gray = 0.2989 * x[..., 0] + 0.5870 * x[..., 1] + 0.1140 * x[..., 2]
        else:
            gray = x.reshape(x.shape[0], x.shape[1], x.shape[2])
        n, h, _ = gray.shape
        hp = gray - _median_filter(gray, max(h // 8, 1))
        f = np.fft.fftshift(np.fft.fft2(hp), axes=(-2, -1))
        return (20.0 * np.log(np.abs(f) + 1e-12)).mean(axis=0)

    return spectrum(real_u8), spectrum(fake_u8)


def tsne_embeds(real_feats: np.ndarray, fake_feats: np.ndarray,
                perplexity: float = 40.0, n_iter: int = 300,
                seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """2-D t-SNE of real vs fake embeddings (ref worker.py:1297-1392).

    Fits ONE t-SNE over the concatenation so both clouds share a space
    (the reference fits separately, which makes the two plots incomparable
    — deliberate fix), then splits. Falls back to PCA if sklearn is absent.
    Returns (real_2d [N,2], fake_2d [M,2]).
    """
    n = real_feats.shape[0]
    both = np.concatenate([real_feats, fake_feats], 0).astype(np.float32)
    try:
        from sklearn.manifold import TSNE
        kw = dict(n_components=2, random_state=seed, init="pca",
                  perplexity=min(perplexity, max(both.shape[0] // 4, 2)))
        try:
            tsne = TSNE(max_iter=max(n_iter, 250), **kw)
        except TypeError:  # sklearn < 1.5 spells it n_iter
            tsne = TSNE(n_iter=max(n_iter, 250), **kw)
        pts = tsne.fit_transform(both)
    except ImportError:  # PCA fallback
        both = both - both.mean(0)
        _, _, vt = np.linalg.svd(both, full_matrices=False)
        pts = both @ vt[:2].T
    return pts[:n], pts[n:]


def semantic_factorization(gen_fn: Callable, first_kernel: jnp.ndarray,
                           z: jnp.ndarray, y: jnp.ndarray,
                           num_axes: int = 4, max_variation: float = 5.0,
                           num_cols: int = 8) -> np.ndarray:
    """Closed-form latent navigation, SeFa (ref utils/sefa.py:12-30).

    The semantic axes are the top right-singular directions (in z-space) of
    the generator's FIRST dense layer: for a flax kernel [z_dim, out] those
    are the left singular vectors U[:, :num_axes] (the reference's
    `torch.svd(weight).V` on its [out, in] layout — same thing). Each row
    of the canvas walks z -> z + max_variation * axis_i in num_cols steps;
    all rows render in ONE batched gen_fn call.

    Returns [num_axes, num_cols, H, W, C] float images.
    """
    u, _, _ = jnp.linalg.svd(first_kernel.astype(jnp.float32), full_matrices=False)
    axes = u[:, :num_axes]                        # [z_dim, A] z-space directions
    w = jnp.linspace(0.0, 1.0, num_cols)          # [C]
    zs = (z[None, None, :]
          + w[None, :, None] * max_variation * axes.T[:, None, :])  # [A, C, z]
    a, c, zd = zs.shape
    ys = jnp.broadcast_to(y, (a * c,) + y.shape)
    imgs = np.asarray(gen_fn(zs.reshape(a * c, zd), ys))
    return imgs.reshape(a, c, *imgs.shape[1:])


def gan_train_test_accuracy(train_images: np.ndarray, train_labels: np.ndarray,
                            test_images: np.ndarray, test_labels: np.ndarray,
                            num_classes: int,
                            epochs: int = 5, seed: int = 0) -> float:
    """Classification Accuracy Score leg (ref worker.py:1529-1641).

    GAN-train: fit on FAKE, evaluate on REAL. GAN-test: fit on REAL,
    evaluate on FAKE — both are this one function with the arguments
    swapped, as in the reference. Uses the framework's ResNet eval
    backbone (same architecture the SFID protocol trains) on TPU.
    """
    from ccdm_tpu.eval.backbones import ResNetEval
    from ccdm_tpu.eval.metrics import predict_class_labels
    from ccdm_tpu.eval.train_backbones import train_eval_resnet

    cls_vars = train_eval_resnet(
        np.asarray(train_images), np.asarray(train_labels, np.int32),
        "class", num_classes, epochs=epochs, seed=seed)
    pred = predict_class_labels(ResNetEval(num_classes, "class").apply,
                                cls_vars, np.asarray(test_images),
                                batch_size=256)
    return float(np.mean(pred == np.asarray(test_labels)))
