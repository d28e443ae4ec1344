"""DiT-style ViT denoiser (flax, NHWC).

TPU-native re-design of `CCDM_unified/models/vit.py:164-303`: 7x7 init conv
(full spatial resolution — the reference's patch_size is unused in its
forward), N DiTBlocks (adaLN-ish: FiLM scale/shift from time+cond MLP applied
between attention and MLP sublayers), channelwise LayerNorm, 1x1 out conv.
Same CFG null-embedding machinery as the UNet.

Deviation (documented): the reference wires its transformer blocks at
`dims[-1]` channels while init_conv emits `init_dim` — a latent channel
mismatch that errors for any dim_mults not ending in 1 (`vit.py:190,236-250`).
Here init_conv projects directly to the transformer width so every
`dim_mults` preset works.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ccdm_tpu.models.layers import SinusoidalPosEmb, null_cond_init


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis with learned gain/bias
    (`vit.py:13-23`, biased variance, eps 1e-5)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = self.param("g", nn.initializers.ones, (self.dim,))
        b = self.param("b", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * g + b


class TokenAttention(nn.Module):
    """Standard multi-head attention over spatial tokens (`vit.py:26-58`)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(x.reshape(b, n, c))
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.astype(jnp.float32) * (head_dim**-0.5)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k.astype(jnp.float32))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v.astype(jnp.float32)).astype(x.dtype)
        out = nn.Dense(self.dim, name="proj")(out.reshape(b, n, self.dim))
        return out.reshape(b, h, w, self.dim)


class DiTBlock(nn.Module):
    """Attention + MLP with FiLM scale/shift from concat(t_emb, c_emb)
    applied between the two sublayers (`vit.py:93-145`)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: jax.Array, c_emb: jax.Array) -> jax.Array:
        tc = jnp.concatenate([t_emb, c_emb], axis=-1)
        tc = nn.Dense(self.dim * 2, name="tc_mlp")(nn.silu(tc))
        scale, shift = jnp.split(tc[:, None, None, :], 2, axis=-1)

        x = x + TokenAttention(self.dim, self.num_heads, name="attn")(
            ChannelLayerNorm(self.dim, name="norm1")(x)
        )
        x = x * (scale + 1.0) + shift
        h = ChannelLayerNorm(self.dim, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        h = nn.Dense(self.dim, name="mlp_fc2")(nn.silu(h))
        return x + h


class ViT(nn.Module):
    dim: int
    embed_input_dim: int = 128
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    in_channels: int = 3
    out_dim: Optional[int] = None
    learned_variance: bool = False
    attn_heads: int = 4
    num_blocks: int = 8
    dtype: jnp.dtype = jnp.float32

    @property
    def output_channels(self) -> int:
        if self.out_dim is not None:
            return self.out_dim
        return self.in_channels * (2 if self.learned_variance else 1)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        labels_emb: jax.Array,
        keep_mask: Optional[jax.Array] = None,
        train: bool = False,
        return_bottleneck: bool = False,
    ) -> jax.Array:
        dim = self.dim
        width = dim * self.dim_mults[-1]
        time_dim = dim * 4
        cond_emb_dim = dim * 4
        norm = lambda name: nn.BatchNorm(use_running_average=not train, name=name, dtype=jnp.float32)

        c = nn.Dense(dim, name="cond_dense_1")(labels_emb)
        c = nn.relu(norm("cond_bn_1")(c))
        null_emb = self.param("null_cond_emb", null_cond_init, (dim,))
        if keep_mask is not None:
            c = jnp.where(keep_mask[:, None], c, null_emb[None, :].astype(c.dtype))
        c_emb = nn.Dense(cond_emb_dim, name="cond_dense_2")(c)
        c_emb = nn.relu(norm("cond_bn_2")(c_emb))

        t_emb = SinusoidalPosEmb(dim, name="sinu_pos_emb")(t)
        t_emb = nn.Dense(time_dim, name="time_dense_1")(t_emb)
        t_emb = nn.Dense(time_dim, name="time_dense_2")(nn.gelu(t_emb))

        x = nn.Conv(width, (7, 7), padding=3, name="init_conv", dtype=self.dtype)(x.astype(self.dtype))
        t_emb = t_emb.astype(self.dtype)
        c_emb = c_emb.astype(self.dtype)

        for i in range(self.num_blocks):
            x = DiTBlock(width, self.attn_heads, name=f"block_{i}")(x, t_emb, c_emb)

        if return_bottleneck:
            return x
        out = nn.Conv(self.output_channels, (1, 1), name="final_conv", dtype=jnp.float32)(x)
        return out.astype(jnp.float32)
