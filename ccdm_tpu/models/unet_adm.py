"""ADM-style GroupNorm UNet — the vanilla tree's canonical denoiser.

TPU-native re-design of `CCDM_vanilla/RC-49/RC-49_64x64/CCGM/CCDM/models/
unet.py:206-380`: GroupNorm(num_groups) everywhere, per-level
[ResidualBlock (+AttentionBlock at ds in attention_resolutions)] x
num_res_blocks driven by channel_mult, conv down/upsampling, FiLM
use_scale_shift_norm injection of concat(t_emb, c_emb) (mid blocks are
time-only, `:295-299`), CFG null embedding -|N(0,1)| NON-trainable at
cond_embed_dim (`:260`), final GroupNorm+SiLU+conv3x3.

Like ccdm_tpu.models.unet.Unet, the CFG keep-mask is an explicit argument —
this reproduces the vanilla tree's return_null_indx semantics (`:327-380`)
with the mask owned by the caller. NHWC.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

import math

from ccdm_tpu.models.layers import null_cond_init, upsample_nearest_2x


def adm_timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Vanilla-tree sinusoid (`CCDM_vanilla/.../models/unet.py:40-58`):
    cos||sin with frequencies exp(-ln(10000) * arange(half) / half) — note the
    divisor is `half`, unlike the unified tree's lucidrains variant
    (divisor half-1, sin||cos)."""
    t = t.reshape(-1).astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class ADMResBlock(nn.Module):
    out_channels: int
    num_groups: int = 32
    use_scale_shift_norm: bool = True
    has_cond: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: jax.Array, c_emb: Optional[jax.Array]) -> jax.Array:
        gn = lambda name: nn.GroupNorm(self.num_groups, name=name)
        h = nn.silu(gn("norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)

        tc = t_emb if (c_emb is None or not self.has_cond) else jnp.concatenate([t_emb, c_emb], axis=-1)
        width = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        tc = nn.Dense(width, name="tc_mlp")(nn.silu(tc))[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(tc, 2, axis=-1)
            h = gn("norm2")(h) * (1.0 + scale) + shift
            h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(nn.silu(h))
        else:
            h = nn.silu(gn("norm2")(h + tc))
            h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)

        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return h + x


class ADMAttentionBlock(nn.Module):
    """qkv 1x1 attention with the ADM double-sqrt scaling (`unet.py:154-175`)."""

    num_heads: int = 4
    num_groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        n = hh * ww
        head_dim = c // self.num_heads
        h = nn.GroupNorm(self.num_groups, name="norm")(x)
        qkv = nn.Conv(c * 3, (1, 1), use_bias=False, name="qkv")(h)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = 1.0 / (head_dim ** 0.25)
        sim = jnp.einsum("bihd,bjhd->bhij", (q * scale).astype(jnp.float32),
                         (k * scale).astype(jnp.float32))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v.astype(jnp.float32)).astype(x.dtype)
        out = nn.Conv(c, (1, 1), name="proj")(out.reshape(b, hh, ww, c))
        return out + x


class ADMUnet(nn.Module):
    embed_input_dim: int = 128
    in_channels: int = 3
    model_channels: int = 128
    out_channels: Optional[int] = None
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (8, 16)
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    num_heads: int = 4
    use_scale_shift_norm: bool = True
    learned_variance: bool = False
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @property
    def output_channels(self) -> int:
        if self.out_channels is not None:
            return self.out_channels
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
        mc = self.model_channels
        time_dim = mc * 4
        cond_dim = mc * 4

        t_emb = adm_timestep_embedding(t, mc)
        t_emb = nn.Dense(time_dim, name="time_dense_1")(t_emb)
        t_emb = nn.Dense(time_dim, name="time_dense_2")(nn.silu(t_emb))

        c = nn.Dense(cond_dim, name="classes_dense")(labels_emb)
        c = nn.relu(nn.BatchNorm(use_running_average=not train, name="classes_bn")(c))
        # non-trainable null embedding (vanilla unet.py:260): lives in params
        # for plumbing simplicity but is frozen via stop_gradient
        null_emb = jax.lax.stop_gradient(
            self.param("null_classes_emb", null_cond_init, (cond_dim,))
        )
        if keep_mask is not None:
            c_emb = jnp.where(keep_mask[:, None], c, null_emb[None, :].astype(c.dtype))
        else:
            c_emb = c

        t_emb = t_emb.astype(self.dtype)
        c_emb = c_emb.astype(self.dtype)
        h = nn.Conv(mc, (3, 3), padding=1, name="init_conv", dtype=self.dtype)(x.astype(self.dtype))

        skips = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = ADMResBlock(mult * mc, self.num_groups, self.use_scale_shift_norm,
                                name=f"down_{level}_{i}")(h, t_emb, c_emb)
                if ds in self.attention_resolutions:
                    h = ADMAttentionBlock(self.num_heads, self.num_groups,
                                          name=f"down_{level}_{i}_attn")(h)
                skips.append(h)
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), strides=2, padding=1,
                            name=f"down_{level}_downsample")(h)
                skips.append(h)
                ds *= 2

        # middle: time-only conditioning (vanilla unet.py:295-299, 368)
        ch = h.shape[-1]
        h = ADMResBlock(ch, self.num_groups, self.use_scale_shift_norm, has_cond=False,
                        name="mid_block1")(h, t_emb, None)
        if return_bottleneck:
            return h
        h = ADMAttentionBlock(self.num_heads, self.num_groups, name="mid_attn")(h)
        h = ADMResBlock(ch, self.num_groups, self.use_scale_shift_norm, has_cond=False,
                        name="mid_block2")(h, t_emb, None)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ADMResBlock(mult * mc, self.num_groups, self.use_scale_shift_norm,
                                name=f"up_{level}_{i}")(h, t_emb, c_emb)
                if ds in self.attention_resolutions:
                    h = ADMAttentionBlock(self.num_heads, self.num_groups,
                                          name=f"up_{level}_{i}_attn")(h)
                if level and i == self.num_res_blocks:
                    h = upsample_nearest_2x(h)
                    h = nn.Conv(h.shape[-1], (3, 3), padding=1, name=f"up_{level}_upsample")(h)
                    ds //= 2

        h = nn.silu(nn.GroupNorm(self.num_groups, name="out_norm")(h))
        out = nn.Conv(self.output_channels, (3, 3), padding=1, name="out_conv", dtype=jnp.float32)(h)
        return out.astype(jnp.float32)
