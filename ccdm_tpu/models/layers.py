"""Shared flax building blocks for the denoiser networks.

TPU-native re-design of `CCDM_unified/models/unet.py:64-240` (helper modules)
with NHWC layout throughout: channels sit on the TPU lane dimension, convs map
straight onto the MXU, and attention works on [B, N, H, D] token layouts.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class RMSNorm(nn.Module):
    """Channelwise RMSNorm with learned gain.

    Matches `models/unet.py:83-89`: x / ||x||_2(channel) * g * sqrt(C), which
    equals the classic x / rms(x) * g. Channel axis is last (NHWC).
    """

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = self.param("g", nn.initializers.ones, (self.dim,))
        # statistics in f32 for stability; output stays in the activation
        # dtype (an f32 gain would silently promote every post-conv tensor)
        inv = jax.lax.rsqrt(
            jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True) + 1e-12
        )
        return x * inv.astype(x.dtype) * g.astype(x.dtype)


class SinusoidalPosEmb(nn.Module):
    """Transformer-style sinusoidal embedding of (timestep) scalars.

    Matches `models/unet.py:102-115`: half sin, half cos, geometric
    frequencies with base 10000.
    """

    dim: int

    def __call__(self, t: jax.Array) -> jax.Array:
        t = t.reshape(-1).astype(jnp.float32)
        half = self.dim // 2
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
        args = t[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ConvBlock(nn.Module):
    """conv3x3 -> RMSNorm -> optional FiLM(scale,shift) -> SiLU.

    Matches `models/unet.py:136-152`.
    """

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, scale_shift: Optional[Tuple[jax.Array, jax.Array]] = None) -> jax.Array:
        x = nn.Conv(self.dim_out, (3, 3), padding=1, name="proj", dtype=self.dtype)(x)
        x = RMSNorm(self.dim_out, name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlock(nn.Module):
    """Two ConvBlocks with FiLM injection of concat(time_emb, cond_emb).

    Matches `models/unet.py:154-187`: tc_mlp = SiLU -> Linear -> split into
    (scale, shift) applied in block1 only; 1x1 residual projection when the
    channel count changes.
    """

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: jax.Array, c_emb: Optional[jax.Array] = None) -> jax.Array:
        tc = t_emb if c_emb is None else jnp.concatenate([t_emb, c_emb], axis=-1)
        tc = nn.Dense(self.dim_out * 2, name="tc_mlp", dtype=self.dtype)(nn.silu(tc))
        scale, shift = jnp.split(tc[:, None, None, :], 2, axis=-1)

        h = ConvBlock(self.dim_out, dtype=self.dtype, name="block1")(x, (scale, shift))
        h = ConvBlock(self.dim_out, dtype=self.dtype, name="block2")(h)

        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), name="res_conv", dtype=self.dtype)(x)
        return h + x


class FusedResnetBlock(nn.Module):
    """ResnetBlock computed as ONE fused kernel per batch cell.

    Semantically identical to ResnetBlock above (same parameter count and
    initializers; tc_mlp stays an XLA Dense — it is [B, dim]-sized), but
    the conv3x3→norm→FiLM→SiLU→conv3x3→norm→SiLU→+residual chain runs
    VMEM-resident (`ops/resnet_block.py`): x read from HBM once, y written
    once, instead of bouncing h1/h2 and the residual read through HBM.
    Reference: torch `models/unet.py:136-187`.
    """

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: jax.Array, c_emb: Optional[jax.Array] = None) -> jax.Array:
        from ccdm_tpu.ops.resnet_block import fused_resnet_block

        b, hh, ww, cin = x.shape
        cout = self.dim_out
        tc = t_emb if c_emb is None else jnp.concatenate([t_emb, c_emb], axis=-1)
        tc = nn.Dense(cout * 2, name="tc_mlp", dtype=self.dtype)(nn.silu(tc))
        scale, shift = jnp.split(tc, 2, axis=-1)  # [B, Cout] each

        init = nn.initializers.lecun_normal()
        w1 = self.param("conv1_kernel", init, (3, 3, cin, cout))
        b1 = self.param("conv1_bias", nn.initializers.zeros, (cout,))
        g1 = self.param("norm1_g", nn.initializers.ones, (cout,))
        w2 = self.param("conv2_kernel", init, (3, 3, cout, cout))
        b2 = self.param("conv2_bias", nn.initializers.zeros, (cout,))
        g2 = self.param("norm2_g", nn.initializers.ones, (cout,))
        has_res = cin != cout
        if has_res:
            wres = self.param("res_kernel", init, (cin, cout))
            bres = self.param("res_bias", nn.initializers.zeros, (cout,))
        else:  # fixed custom_vjp arity; ignored, zero-grad
            wres = jnp.zeros((cin, cout), jnp.float32)
            bres = jnp.zeros((cout,), jnp.float32)

        y = fused_resnet_block(x.astype(self.dtype).reshape(b, hh * ww, cin),
                               scale, shift, w1, b1, g1, w2, b2, g2,
                               wres, bres, hh, ww, has_res)
        return y.reshape(b, hh, ww, cout)


class LinearAttention(nn.Module):
    """Linear (efficiency) attention over the spatial map.

    Matches `models/unet.py:189-216`: softmax(q over per-head channel dim),
    softmax(k over spatial dim), two einsum contractions, 1x1 out conv
    followed by RMSNorm. The softmax->context->out pipeline runs as ONE
    fused Pallas kernel on TPU (ccdm_tpu.ops.linear_attention) — the
    unfused version is HBM-bound on materialized intermediates and was the
    largest single cost in the 64^2 sampler.
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ccdm_tpu.ops.linear_attention import linear_attention

        b, hh, ww, c = x.shape
        n = hh * ww
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, name="to_qkv", dtype=self.dtype)(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, D]

        out = linear_attention(q, k, v)  # fused softmaxes + contractions
        out = out.reshape(b, hh, ww, hidden)
        out = nn.Conv(self.dim, (1, 1), name="to_out", dtype=self.dtype)(out)
        return RMSNorm(self.dim, name="out_norm")(out)


class FusedLinearAttentionBlock(nn.Module):
    """x + out_norm(W_out · linattn(W_qkv · pre_norm(x))) as ONE fused op.

    Semantically identical to PreNormResidual(LinearAttention(...)) — same
    parameter count and initializers (1x1 convs = dense kernels) — but the
    whole chain runs per batch cell in VMEM (`ops/attn_block.py`), reading
    x from HBM once and writing the residual output once, instead of
    bouncing [N,3F]/[N,F] intermediates through HBM. The reference
    composition is Residual(PreNorm(LinearAttention)) at torch
    unet.py:66-99,189-216.
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ccdm_tpu.ops.attn_block import fused_attn_block

        b, hh, ww, c = x.shape
        hidden = self.heads * self.dim_head
        init = nn.initializers.lecun_normal()
        g_pre = self.param("norm_g", nn.initializers.ones, (c,))
        wqkv = self.param("qkv_kernel", init, (c, 3 * hidden))
        wout = self.param("out_kernel", init, (hidden, self.dim))
        bout = self.param("out_bias", nn.initializers.zeros, (self.dim,))
        g_out = self.param("out_norm_g", nn.initializers.ones, (self.dim,))

        y = fused_attn_block(x.astype(self.dtype).reshape(b, hh * ww, c),
                             g_pre, wqkv, wout, bout, g_out,
                             self.heads, self.dim_head)
        return y.reshape(b, hh, ww, c)


class Attention(nn.Module):
    """Full softmax attention over the spatial map (mid-block).

    Matches `models/unet.py:218-240`. Attention math runs in f32 regardless
    of the activation dtype so softmax stays stable in bf16 runs.
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        n = hh * ww
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, name="to_qkv", dtype=self.dtype)(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, D]

        q = q.astype(jnp.float32) * (self.dim_head**-0.5)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k.astype(jnp.float32))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v.astype(jnp.float32)).astype(x.dtype)
        out = out.reshape(b, hh, ww, hidden)
        return nn.Conv(self.dim, (1, 1), name="to_out", dtype=self.dtype)(out)


class PreNormResidual(nn.Module):
    """x + fn(RMSNorm(x)) — matches Residual(PreNorm(...)) at unet.py:66-99."""

    dim: int
    fn: Callable

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return x + self.fn(RMSNorm(self.dim, name="norm")(x))


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample in NHWC via broadcast-reshape (no gather)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class _UpsampleConv(nn.Module):
    """conv3x3-over-nearest-2x with nn.Conv's parameter tree ({kernel,bias},
    so checkpoints are interchangeable with the materialized composition).

    Default: the reference composition — in-graph XLA fuses the nearest-2x
    broadcast into the conv input, so it is already traffic-optimal there.
    CCDM_TPU_UPSAMPLE=conv3|conv2x3 opts in the exact tap-fold rewrite
    (`ops/upsample_fold.py`), which wins only where the producer can't be
    fused into the conv (measured A/B: PROFILE.md §8)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ccdm_tpu.ops import upsample_fold

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.dim_out))
        bias = self.param("bias", nn.initializers.zeros, (self.dim_out,))
        x = x.astype(self.dtype)
        variant = upsample_fold.UPSAMPLE_VARIANT
        # opt-in fold gated on source size: below 32^2 even the standalone
        # win disappears into dispatch noise (PROFILE.md §8)
        small = x.shape[1] * x.shape[2] < 32 * 32
        if (variant == "reference" or small
                or jax.default_backend() != "tpu"):
            return upsample_fold.upsample_conv3x3_reference(x, kernel, bias)
        return upsample_fold.upsample_conv3x3_folded(x, kernel, bias, variant)


class Upsample(nn.Module):
    """nearest 2x + conv3x3 (`models/unet.py:74-78`)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return _UpsampleConv(self.dim_out, dtype=self.dtype, name="conv")(x)


class Downsample(nn.Module):
    """conv4x4 stride2 pad1 (`models/unet.py:80-81`)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(self.dim_out, (4, 4), strides=2, padding=1, name="conv", dtype=self.dtype)(x)


def null_cond_init(key: jax.Array, shape: Sequence[int], dtype=jnp.float32) -> jax.Array:
    """Trainable null-condition embedding initialized as -|N(0,1)|
    (`models/unet.py:305`)."""
    return -jnp.abs(jax.random.normal(key, shape, dtype))
