"""Learned combiners for multi-dimensional label embeddings.

TPU-native re-design of `CCDM_unified/label_embedding.py:37-209` (attention
combiners) and the dim_combination dispatch in fn_y2h/fn_y2cov
(`:946-1000`): given per-dimension embeddings stacked [D, B, E], combine to
[B, E] via:
- mean: plain average
- weighted: softmax(learned per-dim weights) sum
- attention: per-(B,D) scores from a small MLP, softmax over D, weighted sum
- cross: flatten [B, D*E] -> MLP -> [B, E]
- cross_attention: multi-head cross attention over the D axis with mean
  query pooling (CrossAttention, `:37-118`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class WeightedCombiner(nn.Module):
    num_dims: int

    @nn.compact
    def __call__(self, stacked: jax.Array) -> jax.Array:  # [D, B, E]
        w = self.param("dim_weights", nn.initializers.ones, (self.num_dims,))
        w = jax.nn.softmax(w)[:, None, None]
        return jnp.sum(stacked * w, axis=0)


class AttentionCombiner(nn.Module):
    embed_dim: int
    hidden: int = 64

    @nn.compact
    def __call__(self, stacked: jax.Array) -> jax.Array:
        x = jnp.transpose(stacked, (1, 0, 2))  # [B, D, E]
        scores = nn.Dense(self.hidden, name="attn_fc1")(x)
        scores = nn.Dense(1, name="attn_fc2")(jnp.tanh(scores))[..., 0]  # [B, D]
        w = jax.nn.softmax(scores, axis=-1)[..., None]
        return jnp.sum(x * w, axis=1)


class CrossCombiner(nn.Module):
    embed_dim: int
    num_dims: int

    @nn.compact
    def __call__(self, stacked: jax.Array) -> jax.Array:
        x = jnp.transpose(stacked, (1, 0, 2)).reshape(stacked.shape[1], -1)  # [B, D*E]
        h = nn.relu(nn.Dense(self.embed_dim * 2, name="fc1")(x))
        return nn.Dense(self.embed_dim, name="fc2")(h)


class CrossAttentionCombiner(nn.Module):
    """Multi-head cross attention over label dims (label_embedding.py:37-118):
    mean-pooled query attends to per-dim embeddings; residual + LayerNorm."""

    embed_dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, stacked: jax.Array) -> jax.Array:
        x = jnp.transpose(stacked, (1, 0, 2))  # [B, D, E]
        b, d, e = x.shape
        hd = self.embed_dim // self.num_heads
        q_in = jnp.mean(x, axis=1, keepdims=True)  # [B, 1, E]
        q = nn.Dense(self.embed_dim, name="q_proj")(q_in).reshape(b, 1, self.num_heads, hd)
        k = nn.Dense(self.embed_dim, name="k_proj")(x).reshape(b, d, self.num_heads, hd)
        v = nn.Dense(self.embed_dim, name="v_proj")(x).reshape(b, d, self.num_heads, hd)
        sim = jnp.einsum("bihd,bjhd->bhij", q * (hd**-0.5), k)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, 1, self.embed_dim)[:, 0]
        out = nn.Dense(self.embed_dim, name="out_proj")(out)
        return nn.LayerNorm(name="norm")(out + q_in[:, 0])


def make_combiner(kind: str, embed_dim: int, num_dims: int):
    """Returns (module_or_None, pure_fn_or_None): mean needs no params."""
    if kind == "mean":
        return None
    if kind == "weighted":
        return WeightedCombiner(num_dims)
    if kind == "attention":
        return AttentionCombiner(embed_dim)
    if kind == "cross":
        return CrossCombiner(embed_dim, num_dims)
    if kind == "cross_attention":
        return CrossAttentionCombiner(embed_dim)
    raise ValueError(f"unknown dim_combination {kind}")
