"""Non-learned label embeddings: sinusoidal and Gaussian-Fourier.

TPU-native re-design of the analytic branches of
`CCDM_unified/label_embedding.py:861-1178` (fn_y2h / fn_y2cov):
- sinusoidal: cos||sin with base-10000 geometric frequencies; y2h rescales to
  [0,1] via (e+1)/2, y2cov shifts to non-negative via e+1.
- gaussian: random Fourier features sin||cos of 2*pi*scale*W*y; same output
  rescaling. The reference builds a NEW random projection on every scalar
  call (`label_embedding.py:1023`) — a non-determinism defect (SURVEY §2.1);
  here the projection matrix is derived once from a fixed PRNG seed.
- multi-dim labels: per-dimension embedding; >20 dims subsampled to <=10
  representative dims (`:880-888`); combined by mean (the learned
  weighted/attention/cross combiners live in embedding/combine.py and
  require trained params).

All functions are pure jax and safe to close over inside a jitted train step.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _selected_dims(label_dim: int) -> Sequence[int]:
    """Representative-dim subsampling for >20-dim labels (`:880-888`)."""
    if label_dim <= 20:
        return list(range(label_dim))
    dims = list(range(0, label_dim, max(1, label_dim // 10)))
    return dims[:10]


def sinusoidal_embedding(y: jax.Array, embed_dim: int) -> jax.Array:
    """[B] scalars -> [B, embed_dim] cos||sin embedding (raw, in [-1,1])."""
    y = y.reshape(-1).astype(jnp.float32)
    half = embed_dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = y[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if embed_dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def gaussian_fourier_embedding(y: jax.Array, W: jax.Array) -> jax.Array:
    """[B] scalars x fixed weights [half] -> [B, 2*half] sin||cos features."""
    y = y.reshape(-1).astype(jnp.float32)
    proj = y[:, None] * W[None, :] * 2.0 * jnp.pi
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def _make_fn(embed_dim: int, embed_type: str, rescale: str, label_dim: int,
             seed: int, gfp_scale: float, dim_combination: str = "mean") -> Callable:
    dims = _selected_dims(label_dim)
    if embed_type == "gaussian":
        # one fixed projection per selected dim (deterministic; fixes the
        # reference's fresh-randn-per-call defect)
        key = jax.random.PRNGKey(seed)
        Ws = jax.random.normal(key, (len(dims), embed_dim // 2)) * gfp_scale

    combiner_apply = None
    if dim_combination != "mean" and label_dim > 1:
        # learned combiners exist as modules but the reference never trains
        # them (they live outside every optimizer, label_embedding.py:212+);
        # fixed-seed init reproduces that behavior deterministically.
        from ccdm_tpu.embedding.combine import make_combiner

        combiner = make_combiner(dim_combination, embed_dim, len(dims))
        cvars = combiner.init(jax.random.PRNGKey(seed + 7),
                              jnp.zeros((len(dims), 1, embed_dim)))
        combiner_apply = lambda stacked: combiner.apply(cvars, stacked)

    def embed_scalar(y_flat: jax.Array, d_idx: int) -> jax.Array:
        if embed_type == "sinusoidal":
            e = sinusoidal_embedding(y_flat, embed_dim)
        elif embed_type == "gaussian":
            e = gaussian_fourier_embedding(y_flat, Ws[d_idx])
        else:
            raise ValueError(f"analytic embedding got type {embed_type}")
        if rescale == "unit":
            return (e + 1.0) / 2.0  # y2h: [0,1]
        return e + 1.0  # y2cov: non-negative

    def fn(labels: jax.Array) -> jax.Array:
        labels = jnp.asarray(labels, jnp.float32)
        if labels.ndim == 1 or labels.shape[-1] == 1:
            return embed_scalar(labels.reshape(-1), 0)
        per_dim = jnp.stack([embed_scalar(labels[:, d], i) for i, d in enumerate(dims)])
        if combiner_apply is not None:
            return combiner_apply(per_dim)
        return jnp.mean(per_dim, axis=0)

    return fn


def make_fn_y2h(embed_dim: int = 128, embed_type: str = "sinusoidal",
                label_dim: int = 1, seed: int = 2023, gfp_scale: float = 30.0,
                dim_combination: str = "mean") -> Callable:
    """fn_y2h(labels [B] or [B,D]) -> [B, embed_dim] in [0,1]."""
    return _make_fn(embed_dim, embed_type, "unit", label_dim, seed, gfp_scale,
                    dim_combination)


def make_fn_y2cov(cov_dim: int, embed_type: str = "sinusoidal",
                  label_dim: int = 1, seed: int = 2024, gfp_scale: float = 30.0,
                  dim_combination: str = "mean") -> Callable:
    """fn_y2cov(labels) -> [B, C*H*W] non-negative (feeds H(y)=exp(-.))."""
    return _make_fn(cov_dim, embed_type, "nonneg", label_dim, seed, gfp_scale,
                    dim_combination)
