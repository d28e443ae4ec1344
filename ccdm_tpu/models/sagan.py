"""SAGAN generator/discriminator (flax, NHWC).

TPU-native re-design of `CCDM_unified/models/sagan.py:34-332`: spectral norm
on every conv/linear (incl. the generator, unlike SNGAN), ConditionalBatchNorm
conditioning, and a Self_Attn block (1x1 theta/phi/g convs with 2x maxpooled
keys/values and a learned sigma gate) at 16^2 in G / after block1 in D.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ccdm_tpu.models.layers import upsample_nearest_2x
from ccdm_tpu.models.sngan import ConditionalBatchNorm, _xavier


class SNConv(nn.Module):
    features: int
    kernel: tuple = (3, 3)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        conv = nn.Conv(self.features, self.kernel, padding=(self.kernel[0] - 1) // 2,
                       kernel_init=_xavier(1.0), name="conv")
        return nn.SpectralNorm(conv)(x, update_stats=train)


class SNDense(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        dense = nn.Dense(self.features, use_bias=self.use_bias,
                         kernel_init=_xavier(1.0), name="dense")
        return nn.SpectralNorm(dense)(x, update_stats=train)


class SelfAttn(nn.Module):
    """SAGAN self-attention with maxpooled phi/g and sigma gate
    (sagan.py:34-77)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        b, h, w, ch = x.shape
        n = h * w
        theta = SNConv(ch // 8, (1, 1), name="theta")(x, train).reshape(b, n, ch // 8)
        phi = SNConv(ch // 8, (1, 1), name="phi")(x, train)
        phi = nn.max_pool(phi, (2, 2), strides=(2, 2)).reshape(b, n // 4, ch // 8)
        attn = jax.nn.softmax(jnp.einsum("bnc,bmc->bnm", theta, phi), axis=-1)
        g = SNConv(ch // 2, (1, 1), name="g")(x, train)
        g = nn.max_pool(g, (2, 2), strides=(2, 2)).reshape(b, n // 4, ch // 2)
        attn_g = jnp.einsum("bnm,bmc->bnc", attn, g).reshape(b, h, w, ch // 2)
        attn_g = SNConv(ch, (1, 1), name="attn_out")(attn_g, train)
        sigma = self.param("sigma", nn.initializers.zeros, (1,))
        return x + sigma * attn_g


class GenBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array, train: bool) -> jax.Array:
        h = nn.relu(ConditionalBatchNorm(x.shape[-1], momentum=0.999, name="cond_bn1")(x, y, train))
        h = upsample_nearest_2x(h)
        h = SNConv(self.out_channels, name="snconv1")(h, train)
        h = nn.relu(ConditionalBatchNorm(self.out_channels, momentum=0.999, name="cond_bn2")(h, y, train))
        h = SNConv(self.out_channels, name="snconv2")(h, train)
        x0 = SNConv(self.out_channels, (1, 1), name="snconv0")(upsample_nearest_2x(x), train)
        return h + x0


class SAGANGenerator(nn.Module):
    dim_z: int = 128
    dim_embed: int = 128
    nc: int = 3
    img_size: int = 64
    gene_ch: int = 32
    ch_multi: Sequence[int] = (16, 8, 4, 2, 1)

    @nn.compact
    def __call__(self, z: jax.Array, y: jax.Array, train: bool = False) -> jax.Array:
        assert self.img_size in (64, 128, 192)
        init_size = 6 if self.img_size == 192 else 4
        m = self.ch_multi
        h = SNDense(self.gene_ch * m[0] * init_size * init_size, name="snlinear0")(z, train)
        h = h.reshape(-1, init_size, init_size, self.gene_ch * m[0])
        h = GenBlock(self.gene_ch * m[1], name="block1")(h, y, train)
        h = GenBlock(self.gene_ch * m[2], name="block2")(h, y, train)
        h = SelfAttn(name="self_attn")(h, train)
        h = GenBlock(self.gene_ch * m[3], name="block3")(h, y, train)
        h = GenBlock(self.gene_ch * m[4], name="block4")(h, y, train)
        if self.img_size in (128, 192):
            h = GenBlock(self.gene_ch, name="block5")(h, y, train)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9999, name="bn")(h)
        h = SNConv(self.nc, name="snconv_out")(nn.relu(h), train)
        return jnp.tanh(h)


class DiscBlock(nn.Module):
    out_channels: int
    downsample: bool = True
    first: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        pool = lambda v: nn.avg_pool(v, (2, 2), strides=(2, 2))
        if self.first:
            h = SNConv(self.out_channels, name="snconv1")(x, train)
            h = SNConv(self.out_channels, name="snconv2")(nn.relu(h), train)
            h = pool(h)
            x0 = SNConv(self.out_channels, (1, 1), name="snconv0")(pool(x), train)
        else:
            h = SNConv(self.out_channels, name="snconv1")(nn.relu(x), train)
            h = SNConv(self.out_channels, name="snconv2")(nn.relu(h), train)
            if self.downsample:
                h = pool(h)
            x0 = x
            if self.downsample or x.shape[-1] != self.out_channels:
                x0 = SNConv(self.out_channels, (1, 1), name="snconv0")(x0, train)
                if self.downsample:
                    x0 = pool(x0)
        return h + x0


class SAGANDiscriminator(nn.Module):
    dim_embed: int = 128
    nc: int = 3
    img_size: int = 64
    disc_ch: int = 32
    ch_multi: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array, train: bool = False) -> jax.Array:
        assert self.img_size in (64, 128, 192)
        init_size = 6 if self.img_size == 192 else 4
        m = self.ch_multi or ((1, 2, 4, 8, 16) if self.img_size == 64 else (1, 2, 2, 4, 8, 16))
        c = self.disc_ch

        h = DiscBlock(c * m[0], first=True, name="opt_block1")(x, train)
        h = DiscBlock(c * m[1], name="block1")(h, train)
        h = SelfAttn(name="self_attn")(h, train)
        h = DiscBlock(c * m[2], name="block2")(h, train)
        h = DiscBlock(c * m[3], name="block3")(h, train)
        if self.img_size == 64:
            h = DiscBlock(c * m[4], downsample=False, name="block4")(h, train)
        else:
            h = DiscBlock(c * m[4], name="block4")(h, train)
            h = DiscBlock(c * m[5], downsample=False, name="block5")(h, train)
        h = nn.relu(h)

        feat_dim = c * m[-1] * init_size * init_size
        phi = jnp.transpose(h, (0, 3, 1, 2)).reshape(-1, feat_dim)
        out1 = SNDense(1, name="snlinear1")(phi, train)[:, 0]
        h_labels = SNDense(feat_dim, use_bias=False, name="sn_embedding1")(y, train)
        return out1 + jnp.sum(phi * h_labels, axis=1)
