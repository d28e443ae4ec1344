"""Vicinal loss weighting — hard/soft, classic and sliced variants.

TPU-native re-design of the batch-weighting block of the reference
(`CCDM_unified/diffusion.py:596-733`) and the per-sample trainer weights
(`CCDM_unified/trainer.py:662-687`, vanilla `trainer.py:279-283`).

All variants are expressed as fully-vectorized [B,B] pairwise computations
(the reference loops over projections in Python; here the projection axis is
just another batched matmul dim, so the whole weighting is two einsums and an
elementwise reduce — MXU/VPU friendly, no host round trips).

Conventions:
- labels: [B, D] float32 (scalar labels are D=1)
- null_mask: [B] bool, True where the CFG condition was dropped; dropped rows
  get weight 1.0 (`diffusion.py:663-664, 726-727`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l2_normalize(v: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    return v / (jnp.linalg.norm(v, axis=axis, keepdims=True) + eps)


def random_projection_vectors(key: jax.Array, vector_type: str, dim: int, n: int) -> jax.Array:
    """[n, dim] random projection directions.

    Semantics of `CCDM_unified/diffusion.py:55-79` (gaussian / rademacher /
    sphere).
    """
    if vector_type == "gaussian":
        return jax.random.normal(key, (n, dim))
    if vector_type == "rademacher":
        return jax.random.randint(key, (n, dim), 0, 2).astype(jnp.float32) * 2.0 - 1.0
    if vector_type == "sphere":
        return _l2_normalize(jax.random.normal(key, (n, dim)))
    raise ValueError(f"unknown vector type: {vector_type}")


def pairwise_distance(labels_a: jax.Array, labels_b: jax.Array, distance: str = "l2") -> jax.Array:
    """[A, B] pairwise distances between two label sets ([A,D] and [B,D]).

    Semantics of `CCDM_unified/diffusion.py:674-708` / `:82-93`.
    For D=1 both l1 and l2 reduce to |a-b|; cosine falls back to |a-b| for
    scalars (as the reference does at `diffusion.py:704-708`).
    """
    a = jnp.atleast_2d(labels_a.astype(jnp.float32))
    b = jnp.atleast_2d(labels_b.astype(jnp.float32))
    if a.ndim == 2 and a.shape[-1] == 1:
        return jnp.abs(a - b.T)
    if distance == "l2":
        diff = a[:, None, :] - b[None, :, :]
        return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    if distance == "l1":
        diff = a[:, None, :] - b[None, :, :]
        return jnp.sum(jnp.abs(diff), axis=-1)
    if distance == "cosine":
        an = _l2_normalize(a)
        bn = _l2_normalize(b)
        return 1.0 - an @ bn.T
    raise ValueError(f"unknown distance type: {distance}")


def sliced_batch_weights(
    labels: jax.Array,
    proj_vectors: jax.Array,
    kappa: jax.Array | float,
    hard: bool,
    null_mask: jax.Array | None = None,
) -> jax.Array:
    """Sliced hard/soft vicinal batch weights [B].

    For each of M projection directions v (rows of proj_vectors [M,D]):
    project labels onto normalize(v), take pairwise projection differences
    [B,B]; hard: count |diff| <= kappa*||v||; soft: sum exp(-diff^2/kappa^2);
    average over projections, divide by B, set null rows to 1.
    Semantics of `CCDM_unified/diffusion.py:602-667`.
    """
    labels = jnp.atleast_2d(labels.astype(jnp.float32))
    b = labels.shape[0]
    m = proj_vectors.shape[0]
    v_norm = jnp.linalg.norm(proj_vectors, axis=-1)  # [M]
    v_unit = _l2_normalize(proj_vectors)  # [M, D]
    # [B, M] projections of every label onto every unit direction.
    proj = labels @ v_unit.T
    # [M, B, B] pairwise projection differences.
    diff = proj.T[:, :, None] - proj.T[:, None, :]
    if hard:
        eff_kappa = kappa * v_norm + 1e-8  # [M]
        in_vic = (jnp.abs(diff) <= eff_kappa[:, None, None]).astype(jnp.float32)
        per_proj = jnp.sum(in_vic, axis=-1)  # [M, B]
    else:
        nu = 1.0 / (kappa**2)
        per_proj = jnp.sum(jnp.exp(-nu * diff * diff), axis=-1)  # [M, B]
    weights = jnp.sum(per_proj, axis=0) / m / b  # [B]
    if null_mask is not None:
        weights = jnp.where(null_mask, 1.0, weights)
    return weights


def classic_batch_weights(
    labels: jax.Array,
    kappa: jax.Array | float,
    hard: bool,
    distance: str = "l2",
    null_mask: jax.Array | None = None,
) -> jax.Array:
    """Classic hard/soft vicinal batch weights [B] from intra-batch distances.

    hard: count of batch members within kappa; soft: sum exp(-d^2/kappa^2);
    both divided by B, null rows forced to 1.
    Semantics of `CCDM_unified/diffusion.py:669-730`.
    """
    labels = jnp.atleast_2d(labels.astype(jnp.float32))
    b = labels.shape[0]
    dist = pairwise_distance(labels, labels, distance)
    if hard:
        weights = jnp.sum((dist <= kappa).astype(jnp.float32), axis=-1)
    else:
        nu = 1.0 / (kappa**2)
        weights = jnp.sum(jnp.exp(-nu * dist * dist), axis=-1)
    weights = weights / b
    if null_mask is not None:
        weights = jnp.where(null_mask, 1.0, weights)
    return weights


def hard_weights_from_targets(
    batch_labels: jax.Array,
    target_labels: jax.Array,
    kappa: jax.Array | float,
    distance: str = "l2",
) -> jax.Array:
    """Per-sample hard weights: 1 if d(label_i, target_i) <= kappa else 0.

    Semantics of `CCDM_unified/trainer.py:663-675`.
    """
    a = jnp.atleast_2d(batch_labels.astype(jnp.float32))
    t = jnp.atleast_2d(target_labels.astype(jnp.float32))
    d = _rowwise_distance(a, t, distance)
    return (d <= kappa).astype(jnp.float32)


def soft_weights_from_targets(
    batch_labels: jax.Array,
    target_labels: jax.Array,
    kappa: jax.Array | float,
    distance: str = "l2",
) -> jax.Array:
    """Per-sample soft weights exp(-d^2/kappa^2).

    Semantics of `CCDM_unified/trainer.py:676-687`. Note: the vanilla tree
    instead uses exp(-kappa*d^2) with kappa already inverted
    (`CCDM_vanilla/.../trainer.py:280-283`); callers pass the appropriately
    transformed kappa.
    """
    a = jnp.atleast_2d(batch_labels.astype(jnp.float32))
    t = jnp.atleast_2d(target_labels.astype(jnp.float32))
    d = _rowwise_distance(a, t, distance)
    nu = 1.0 / (kappa**2)
    return jnp.exp(-nu * d * d)


def _rowwise_distance(a: jax.Array, b: jax.Array, distance: str) -> jax.Array:
    """[B] distance between matched rows of a and b ([B,D] each)."""
    if a.shape[-1] == 1:
        return jnp.abs(a - b)[:, 0]
    if distance == "l2":
        return jnp.sqrt(jnp.maximum(jnp.sum((a - b) ** 2, axis=-1), 0.0))
    if distance == "l1":
        return jnp.sum(jnp.abs(a - b), axis=-1)
    if distance == "cosine":
        return 1.0 - jnp.sum(_l2_normalize(a) * _l2_normalize(b), axis=-1)
    raise ValueError(f"unknown distance type: {distance}")
