"""Timestep samplers incl. loss-second-moment importance sampling.

TPU-native re-design of the ADM-G baseline's resamplers
(`CCDM_vanilla/.../ADM_G/guided_diffusion/resample.py:23-152`): uniform
sampling and the loss-aware sampler that keeps a per-timestep history of
recent squared losses and samples t proportional to sqrt(E[loss^2]) with a
uniform floor. The history lives in a pytree so the update happens inside
the jitted train step (the reference synchronizes it with NCCL all_gather;
under pjit the loss terms are already global).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LossAwareState:
    history: jax.Array  # [T, K] ring buffer of recent per-t losses
    counts: jax.Array  # [T] number of recorded losses per t
    num_timesteps: int = struct.field(pytree_node=False)
    history_per_term: int = struct.field(pytree_node=False)
    uniform_prob: float = struct.field(pytree_node=False)


def create_loss_aware_state(num_timesteps: int, history_per_term: int = 10,
                            uniform_prob: float = 0.001) -> LossAwareState:
    return LossAwareState(
        history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
        counts=jnp.zeros((num_timesteps,), jnp.int32),
        num_timesteps=num_timesteps,
        history_per_term=history_per_term,
        uniform_prob=uniform_prob,
    )


def loss_aware_weights(state: LossAwareState) -> jax.Array:
    """Sampling probabilities [T]: sqrt(mean loss^2) + uniform floor; falls
    back to uniform until every term has a full history (resample.py:93-107)."""
    warmed = jnp.all(state.counts >= state.history_per_term)
    w = jnp.sqrt(jnp.mean(state.history**2, axis=-1))
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    w = w * (1.0 - state.uniform_prob) + state.uniform_prob / state.num_timesteps
    uniform = jnp.full((state.num_timesteps,), 1.0 / state.num_timesteps)
    return jnp.where(warmed, w, uniform)


def sample_timesteps(key: jax.Array, state: LossAwareState, batch: int
                     ) -> Tuple[jax.Array, jax.Array]:
    """(t [B], importance_weights [B]) with w = 1/(T*p[t])."""
    p = loss_aware_weights(state)
    t = jax.random.categorical(key, jnp.log(p), shape=(batch,))
    iw = 1.0 / (state.num_timesteps * p[t])
    return t, iw


def update_with_losses(state: LossAwareState, t: jax.Array, losses: jax.Array
                       ) -> LossAwareState:
    """Push per-sample losses into the ring buffers (resample.py:60-91).

    Scatter-based: for each batch element, write loss into slot
    counts[t] % history_per_term and bump counts[t]. Duplicate t's in one
    batch land in consecutive slots thanks to segment-cumsum offsets.
    """
    # order duplicates so each gets a distinct slot
    order = jnp.argsort(t)
    t_sorted = t[order]
    losses_sorted = losses[order]
    # rank of each element within its t-group
    same_as_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                    (t_sorted[1:] == t_sorted[:-1]).astype(jnp.int32)])
    # cumulative within-group index via cumsum reset at group starts
    def scan_fn(carry, same):
        nxt = jnp.where(same == 1, carry + 1, 0)
        return nxt, nxt
    _, rank = jax.lax.scan(scan_fn, jnp.int32(0), same_as_prev)

    slot = (state.counts[t_sorted] + rank) % state.history_per_term
    history = state.history.at[t_sorted, slot].set(losses_sorted)
    counts = state.counts.at[t_sorted].add(1)
    counts = jnp.minimum(counts, state.history_per_term * 2)  # avoid overflow
    return state.replace(history=history, counts=counts)
